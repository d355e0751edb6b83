package graft.queries

import graft.{QueryPack, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gopher-style document-quality rule battery (Rae et al., "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * arXiv 2112.11446, Appendix A1.1) — the per-document repetition and
  * well-formedness signals a web-scale curation pipeline gates on
  * before any deduplication runs:
  *
  *  - d52: fraction of characters claimed by the single most frequent
  *    word n-gram, n ∈ {2,3,4} (the "top n-gram character fraction"
  *    family). Occurrence count × gram character length over document
  *    character length; overlapping occurrences each count, so highly
  *    periodic text can exceed 1.0 — that is the signal, not a defect.
  *  - d53: fraction of word characters covered by duplicated n-grams,
  *    n ∈ {2,3} (the "duplicate n-gram character fraction" family,
  *    computed as true positional COVERAGE: a word inside several
  *    duplicated grams counts once — the interval-union semantics the
  *    Gopher appendix specifies for n ≥ 5; this corpus's documents are
  *    10–99 words of a small vocabulary, so n = 2,3 are the
  *    informative widths here where 5-grams never repeat).
  *  - d54: the quality gate itself — word-count bounds, mean word
  *    length bounds, minimum stopword hits, minimum alphabetic-word
  *    fraction, and the conjunction — C4/Gopher rule flags per doc.
  *
  * 100 TB shape: all three are PURE MAP-SIDE projections — per-row
  * higher-order-function work bounded by the document length (the d53
  * duplicate test is O(m²) per row with m ≤ words-per-doc, a constant
  * per corpus contract, never corpus-scaled), zero shuffles, zero
  * joins: free riders on whatever scan materializes them
  * ([[graft.NewQueryPlanSpec]] pins the no-exchange plans). Every
  * ratio is one IEEE division of two exact integers, bit-identical on
  * any engine.
  */
object QualityOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** (count, gram) of the most frequent element of `gs`, ties broken
    * to the lexicographically smallest, as one per-row fold over the
    * SORTED array: equal grams are adjacent after array_sort, so the
    * longest run is the mode, and strict `>` keeps the first (hence
    * smallest) gram reaching the best run. Empty array → (0, '').
    */
  private def modeOf(gs: Column): Column = {
    val folded = aggregate(
      array_sort(gs),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit("").as("bestg")),
      (s, x) => {
        val run = when(x === s.getField("prev"),
          s.getField("run") + 1L).otherwise(1L)
        struct(x.as("prev"), run.as("run"),
          greatest(run, s.getField("best")).as("best"),
          when(run > s.getField("best"), x)
            .otherwise(s.getField("bestg")).as("bestg"))
      })
    struct(folded.getField("best").as("c"),
      folded.getField("bestg").as("g"))
  }

  /** 1-based start positions (into the gram array, equivalently into
    * the token array) of grams occurring ≥ 2 times in `gs`. O(m²) per
    * row by construction — m is words-per-document, a corpus contract,
    * not a corpus size. */
  private def dupStarts(gs: Column): Column =
    filter(
      when(size(gs) >= 1, sequence(lit(1), size(gs)))
        .otherwise(array().cast("array<int>")),
      i => size(filter(gs, x => x === element_at(gs, i))) >= 2)

  private def sumLens(arr: Column): Column =
    aggregate(arr, lit(0L), (a, w) => a + length(w))

  override def queries: Map[String, QueryFn] = Map(

    "d52_top_ngram_char_frac" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      def cols(n: Int, p: String): Seq[Column] = {
        val mode = modeOf(TextFunctions.wordShingles(col("text"), n))
        val c = mode.getField("c")
        val g = mode.getField("g")
        Seq(g.as(s"${p}_gram"), c.as(s"${p}_cnt"),
          when(c > 0, (c * length(g)).cast("double") /
            length(col("text")).cast("double"))
            .otherwise(lit(0.0)).as(s"${p}_frac"))
      }
      docs.select(col("doc_id") +:
        (cols(2, "top2") ++ cols(3, "top3") ++ cols(4, "top4")): _*)
    },

    "d53_dup_ngram_cover" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val ts = TextFunctions.tokens(col("text"))
      def cols(n: Int, p: String): Seq[Column] = {
        val gs = TextFunctions.wordShingles(col("text"), n)
        val starts = dupStarts(gs)
        val covered = array_distinct(flatten(
          transform(starts, i => sequence(i, i + (n - 1)))))
        val covChars = aggregate(covered, lit(0L),
          (a, j) => a + length(element_at(ts, j)))
        val tot = sumLens(ts)
        Seq(size(starts).as(s"${p}_grams"),
          size(covered).as(s"${p}_words"),
          when(tot > 0, covChars.cast("double") / tot.cast("double"))
            .otherwise(lit(0.0)).as(s"${p}_frac"))
      }
      docs.select(col("doc_id") +: (cols(2, "dup2") ++ cols(3, "dup3")): _*)
    },

    "d54_quality_gate" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val ts = TextFunctions.tokens(col("text"))
      val nWords = size(ts).cast("long")
      val totChars = sumLens(ts)
      val meanWlen = when(nWords > 0,
        totChars.cast("double") / nWords.cast("double")).otherwise(lit(0.0))
      val nStop = TextFunctions.vocabHits(col("text"), GateStopwords)
      val nAlpha = size(filter(ts, w => w.rlike("[a-zA-Z]")))
      val alphaFrac = when(nWords > 0,
        nAlpha.cast("double") / nWords.cast("double")).otherwise(lit(0.0))
      val okWords = nWords >= 50 && nWords <= 100000
      val okMwl = meanWlen >= 3.0 && meanWlen <= 10.0
      val okStop = nStop >= 2
      val okAlpha = alphaFrac >= 0.8
      docs.select(col("doc_id"),
        nWords.as("n_words"), meanWlen.as("mean_wlen"),
        nStop.cast("long").as("n_stop"), alphaFrac.as("alpha_frac"),
        okWords.as("ok_words"), okMwl.as("ok_mwl"),
        okStop.as("ok_stop"), okAlpha.as("ok_alpha"),
        (okWords && okMwl && okStop && okAlpha).as("passes"))
    })

  /** The d04 English stopword set — the gate's "contains at least two
    * stopwords" rule (Gopher A1.1 uses a comparable fixed list). */
  private val GateStopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "that")

  private val ToksCte =
    """WITH toks AS (
         SELECT doc_id, text,
                list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '') AS ts
         FROM documents)"""

  private def gramsSql(n: Int): String =
    s"""CASE WHEN len(ts) >= $n THEN
          list_transform(range(1, len(ts) - $n + 2),
            i -> array_to_string(
              ts[CAST(i AS INT):CAST(i + $n - 1 AS INT)], ' '))
        ELSE [] END"""

  override def oracleSql: Map[String, String] = Map(

    "d52_top_ngram_char_frac" ->
      s"""$ToksCte,
         grams AS (
           SELECT doc_id, text, n,
                  CASE n WHEN 2 THEN ${gramsSql(2)}
                         WHEN 3 THEN ${gramsSql(3)}
                         ELSE ${gramsSql(4)} END AS gs
           FROM toks CROSS JOIN (SELECT unnest([2, 3, 4]) AS n)),
         cnt AS (
           SELECT doc_id, text, n, unnest(gs) AS g
           FROM grams),
         agg AS (
           SELECT doc_id, text, n, g, count(*) AS c
           FROM cnt GROUP BY ALL),
         top AS (
           SELECT doc_id, text, n, g, c, row_number() OVER (
             PARTITION BY doc_id, n ORDER BY c DESC, g ASC) AS rn
           FROM agg),
         piv AS (
           SELECT doc_id, n, g, c,
                  CAST(c * length(g) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE) AS frac
           FROM top WHERE rn = 1)
         SELECT d.doc_id,
           coalesce(p2.g, '') AS top2_gram, coalesce(p2.c, 0) AS top2_cnt,
           coalesce(p2.frac, 0.0) AS top2_frac,
           coalesce(p3.g, '') AS top3_gram, coalesce(p3.c, 0) AS top3_cnt,
           coalesce(p3.frac, 0.0) AS top3_frac,
           coalesce(p4.g, '') AS top4_gram, coalesce(p4.c, 0) AS top4_cnt,
           coalesce(p4.frac, 0.0) AS top4_frac
         FROM documents d
         LEFT JOIN piv p2 ON p2.doc_id = d.doc_id AND p2.n = 2
         LEFT JOIN piv p3 ON p3.doc_id = d.doc_id AND p3.n = 3
         LEFT JOIN piv p4 ON p4.doc_id = d.doc_id AND p4.n = 4""",

    "d53_dup_ngram_cover" ->
      s"""$ToksCte,
         g AS (
           SELECT doc_id, ts, ${gramsSql(2)} AS gs2, ${gramsSql(3)} AS gs3
           FROM toks),
         d AS (
           SELECT doc_id, ts,
             list_filter(range(1, len(gs2) + 1),
               i -> len(list_filter(gs2,
                 x -> x = gs2[CAST(i AS INT)])) >= 2) AS st2,
             list_filter(range(1, len(gs3) + 1),
               i -> len(list_filter(gs3,
                 x -> x = gs3[CAST(i AS INT)])) >= 2) AS st3
           FROM g),
         cov AS (
           SELECT doc_id, ts, st2, st3,
             list_distinct(flatten(list_transform(st2,
               i -> [CAST(i AS INT), CAST(i + 1 AS INT)]))) AS cov2,
             list_distinct(flatten(list_transform(st3,
               i -> [CAST(i AS INT), CAST(i + 1 AS INT),
                     CAST(i + 2 AS INT)]))) AS cov3,
             coalesce(list_sum(list_transform(ts, w -> length(w))), 0)
               AS tot
           FROM d)
         SELECT doc_id,
           CAST(len(st2) AS INT) AS dup2_grams,
           CAST(len(cov2) AS INT) AS dup2_words,
           CASE WHEN tot = 0 THEN 0.0 ELSE
             CAST(coalesce(list_sum(list_transform(cov2,
               j -> length(ts[j]))), 0) AS DOUBLE)
               / CAST(tot AS DOUBLE) END AS dup2_frac,
           CAST(len(st3) AS INT) AS dup3_grams,
           CAST(len(cov3) AS INT) AS dup3_words,
           CASE WHEN tot = 0 THEN 0.0 ELSE
             CAST(coalesce(list_sum(list_transform(cov3,
               j -> length(ts[j]))), 0) AS DOUBLE)
               / CAST(tot AS DOUBLE) END AS dup3_frac
         FROM cov""",

    "d54_quality_gate" ->
      s"""$ToksCte,
         m AS (
           SELECT doc_id,
             CAST(len(ts) AS BIGINT) AS n_words,
             coalesce(list_sum(list_transform(ts, w -> length(w))), 0)
               AS tot,
             CAST(len(list_filter(ts, w -> list_contains(
               ['the','a','of','and','to','in','is','that'], w)))
               AS BIGINT) AS n_stop,
             CAST(len(list_filter(ts, w -> regexp_matches(w, '[a-zA-Z]')))
               AS BIGINT) AS n_alpha
           FROM toks),
         r AS (
           SELECT doc_id, n_words,
             CASE WHEN n_words = 0 THEN 0.0 ELSE
               CAST(tot AS DOUBLE) / CAST(n_words AS DOUBLE) END
               AS mean_wlen,
             n_stop,
             CASE WHEN n_words = 0 THEN 0.0 ELSE
               CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) END
               AS alpha_frac
           FROM m)
         SELECT doc_id, n_words, mean_wlen, n_stop, alpha_frac,
           (n_words >= 50 AND n_words <= 100000) AS ok_words,
           (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS ok_mwl,
           (n_stop >= 2) AS ok_stop,
           (alpha_frac >= 0.8) AS ok_alpha,
           (n_words >= 50 AND n_words <= 100000
             AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
             AND n_stop >= 2 AND alpha_frac >= 0.8) AS passes
         FROM r""")
}
