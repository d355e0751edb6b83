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
  *    informative widths here where 5-grams rarely repeat).
  *  - d55: the same coverage at the appendix's literal dup-gram
  *    widths, n ∈ {5..10} — mostly-zero fractions on THIS corpus by
  *    design (the widths are the contract; the short-doc corpus is
  *    what makes them quiet), sharing every line of machinery with
  *    d53 so the two cannot diverge.
  *  - d54: the quality gate itself — word-count bounds, mean word
  *    length bounds, minimum stopword hits, minimum alphabetic-word
  *    fraction, and the conjunction — C4/Gopher rule flags per doc.
  *
  * 100 TB shape: all three are PURE MAP-SIDE projections — per-row
  * higher-order-function work bounded by the document length (the d53
  * duplicate test is O(m log m) per row with m ≤ words-per-doc, a
  * constant per corpus contract, never corpus-scaled — see
  * [[dupStarts]] for the r13 O(m³) interpreted-HOF defect this shape
  * replaces), zero shuffles, zero joins: free riders on whatever scan
  * materializes them ([[graft.NewQueryPlanSpec]] pins the no-exchange
  * plans, and [[graft.MapSideFloorSpec]] pins a per-row THROUGHPUT
  * floor — shuffle-freedom alone said nothing about CPU). Every
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
    * the token array) of grams occurring ≥ 2 times in `gs`, ascending.
    *
    * Shape matters more than the formula here. The retired r13 version
    * (`filter(sequence(1, size(gs)), i => size(filter(gs, x => x ===
    * element_at(gs, i))) >= 2)`) referenced `gs` INSIDE the lambdas,
    * and interpreted higher-order functions re-evaluate a non-lambda
    * subexpression on every element visit — when `gs` is the full
    * shingle tree (regex tokenize + k−1 zip_with passes) that is ~m²
    * whole-document re-tokenizations per row, effectively O(m³) work
    * and garbage: it hung the r13 sf0.1 bench for 56 minutes
    * (BENCH_r13 rc=124) and could not finish 50 documents in 9
    * minutes. This version is the d52 [[modeOf]] pattern: `gs`
    * appears exactly once, as the argument of the outermost chain —
    * tag each gram with its 1-based position, `array_sort` the
    * `(gram, pos)` structs (equal grams become adjacent runs), then
    * ONE fold buffers the current run and flushes it to the output
    * whenever it ends with length ≥ 2. O(m log m) comparisons plus
    * O(m) flush copies per row, every lambda touching only lambda
    * variables and the accumulator. The [[graft.MapSideFloorSpec]]
    * throughput gate pins this class of defect out of the family.
    */
  private def dupStarts(gs: Column): Column = {
    val indexed = array_sort(
      transform(gs, (x, i) => struct(x.as("g"), (i + 1).as("p"))))
    val z = struct(
      lit(null).cast("string").as("prev"),
      array().cast("array<int>").as("buf"),
      array().cast("array<int>").as("out"))
    // null-safe prev compare: the zero's null prev can never equal a
    // gram (wordShingles filters nulls), so the first element always
    // starts a fresh run — no sentinel string that a pathological
    // token could collide with
    def flushed(s: Column): Column =
      when(size(s.getField("buf")) >= 2,
        concat(s.getField("out"), s.getField("buf")))
        .otherwise(s.getField("out"))
    val folded = aggregate(
      indexed, z,
      (s, e) => {
        val same = e.getField("g") <=> s.getField("prev")
        struct(
          e.getField("g").as("prev"),
          when(same, concat(s.getField("buf"), array(e.getField("p"))))
            .otherwise(array(e.getField("p"))).as("buf"),
          when(same, s.getField("out")).otherwise(flushed(s)).as("out"))
      },
      s => array_sort(flushed(s)))
    folded
  }

  private def sumLens(arr: Column): Column =
    aggregate(arr, lit(0L), (a, w) => a + length(w))

  /** The duplicated-n-gram coverage battery over the widths `ns` —
    * d53's n ∈ {2,3} (the informative widths on this corpus's 10–99
    * word documents) and d55's n ∈ {5..10} (the Gopher appendix's
    * literal dup-gram contract) share this one builder.
    *
    * r15: ONE fused compiled pass for every width
    * ([[graft.functions.DupCover]] — the CdcSegmentsExpr precedent).
    * The r14 sort+fold HOF formulation ran an independent array_sort +
    * aggregate per width, which made d55 (six widths) the bench's
    * slowest query; the kernel tokenizes once and hashes each width's
    * grams with no sort. The struct is produced in its own projection
    * and its fields read in a second — the expression is non-cheap and
    * referenced 3·|ns| times, exactly the condition under which
    * CollapseProject keeps the producer materialized instead of
    * re-inlining one kernel call per output column. The retired r14
    * shape survives as [[dupCoverQuerySorted]], the engine-side
    * reference the equivalence spec runs against.
    */
  private[graft] def dupCoverQueryFused(ns: Seq[Int])(
      s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // coalesce: null text must keep 0-output rows, matching the
    // sorted reference's empty-array guard (ADVICE r14)
    val dc = docs.select(col("doc_id"),
      graft.functions.DupCover.dupCover(
        coalesce(col("text"), lit("")), ns).as("dc"))
    dc.select(col("doc_id") +: ns.flatMap(n => Seq(
      col(s"dc.dup${n}_grams"), col(s"dc.dup${n}_words"),
      col(s"dc.dup${n}_frac"))): _*)
  }

  /** The r14 sort+fold HOF formulation of [[dupCoverQueryFused]], kept as
    * the ENGINE-SIDE reference for the fused-kernel equivalence spec
    * (QualityOpsSpec runs both on hostile inputs and asserts identical
    * rows; the DuckDB oracle is the third, cross-engine formulation).
    * Staged projections, not one nested tree: each expensive array
    * (tokens, per-n duplicate starts, covered positions) becomes a
    * real attribute before any lambda touches it, so interpreted HOF
    * lambdas only ever read lambda variables and O(1) row slots.
    */
  private[graft] def dupCoverQuerySorted(ns: Seq[Int])(
      s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // tokenize ONCE into a real attribute, then shingle every width
    // from it: wordShingles(text, n) embeds the tokenize tree k times
    // (the fold's slices), and interpreted HOF evaluation would re-run
    // the regex split per reference — measured 8.8 → ~4 s on d55's six
    // widths when the token array became a staged column
    // coalesce: null text must keep the retired shape's 0-output rows
    // (transform/array_sort/aggregate would all propagate a null ts
    // into null dup*_grams — ADVICE r14)
    val toks = docs.select(col("doc_id"),
      coalesce(TextFunctions.tokens(col("text")),
        array().cast("array<string>")).as("ts"))
    val staged = toks.select(
      col("doc_id") +:
        col("ts") +:
        ns.map(n => dupStarts(
          TextFunctions.shinglesOf(col("ts"), n)).as(s"st$n")): _*)
    // token positions covered by >= 1 duplicated n-gram (1-based,
    // distinct — a word inside several duplicated grams counts once)
    def cov(n: Int): Column = array_distinct(flatten(
      transform(col(s"st$n"), i => sequence(i, i + (n - 1)))))
    val covd = staged.select(
      Seq(col("doc_id"), col("ts")) ++
        ns.map(n => size(col(s"st$n")).as(s"dup${n}_grams")) ++
        ns.map(n => cov(n).as(s"cov$n")) :+
        sumLens(col("ts")).as("tot"): _*)
    def fracCol(n: Int): Column = {
      val covChars = aggregate(col(s"cov$n"), lit(0L),
        (a, j) => a + length(element_at(col("ts"), j)))
      when(col("tot") > 0,
        covChars.cast("double") / col("tot").cast("double"))
        .otherwise(lit(0.0)).as(s"dup${n}_frac")
    }
    covd.select(
      col("doc_id") +: ns.flatMap(n => Seq(
        col(s"dup${n}_grams"),
        size(col(s"cov$n")).as(s"dup${n}_words"),
        fracCol(n))): _*)
  }

  /** d52 over the widths `ns` — ONE fused compiled pass
    * ([[graft.functions.TopGrams]], r15: the DupCover precedent
    * applied to the mode; the r14 shape ran an array_sort + fold per
    * width). The struct is produced in its own projection and read in
    * a second (the CollapseProject staging condition). The r14 HOF
    * shape survives as [[topGramQuerySorted]] for the equivalence
    * spec.
    */
  private[graft] def topGramQueryFused(ns: Seq[Int])(
      s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tg = docs.select(col("doc_id"), col("text"),
      graft.functions.TopGrams.topGrams(
        coalesce(col("text"), lit("")), ns).as("tg"))
    tg.select(col("doc_id") +: ns.flatMap { n =>
      val g = col(s"tg.top${n}_gram")
      val c = col(s"tg.top${n}_cnt")
      Seq(g.as(s"top${n}_gram"), c.as(s"top${n}_cnt"),
        when(c > 0, (c * length(g)).cast("double") /
          length(col("text")).cast("double"))
          .otherwise(lit(0.0)).as(s"top${n}_frac"))
    }: _*)
  }

  /** The r14 staged-HOF formulation of [[topGramQueryFused]], kept as
    * the engine-side reference for the kernel equivalence spec.
    */
  private[graft] def topGramQuerySorted(ns: Seq[Int])(
      s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val staged = docs.select(col("doc_id"), col("text"),
      coalesce(TextFunctions.tokens(col("text")),
        array().cast("array<string>")).as("ts"))
    def cols(n: Int): Seq[Column] = {
      val mode = modeOf(TextFunctions.shinglesOf(col("ts"), n))
      val c = mode.getField("c")
      val g = mode.getField("g")
      Seq(g.as(s"top${n}_gram"), c.as(s"top${n}_cnt"),
        when(c > 0, (c * length(g)).cast("double") /
          length(col("text")).cast("double"))
          .otherwise(lit(0.0)).as(s"top${n}_frac"))
    }
    staged.select(col("doc_id") +: ns.flatMap(cols): _*)
  }

  override def queries: Map[String, QueryFn] = Map(

    "d52_top_ngram_char_frac" -> topGramQueryFused(Seq(2, 3, 4)) _,

    "d53_dup_ngram_cover" -> dupCoverQueryFused(Seq(2, 3)) _,

    "d55_dup_ngram_cover_wide" -> dupCoverQueryFused(5 to 10) _,

    "d54_quality_gate" -> qualityGateQuery(QualityGateConfig()) _)

  /** The d54 gate's rule thresholds as data (VERDICT r14 stretch #7):
    * a C4-vs-Gopher-vs-house-rules variant is one constructor call,
    * and the DuckDB oracle is GENERATED from the same instance
    * ([[qualityGateSql]]) so the two cannot drift. Defaults are the
    * Gopher-A1.1-style rules d54 has always shipped.
    */
  final case class QualityGateConfig(
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minStopwordHits: Long = 2L, minAlphaFrac: Double = 0.8,
      stopwords: Seq[String] = GateStopwords)

  /** The quality gate over a threshold config — d54 is
    * `qualityGateQuery(QualityGateConfig())`. Pure map-side, one
    * staged tokenize, floor-gated like the rest of the battery.
    */
  private[graft] def qualityGateQuery(cfg: QualityGateConfig)(
      s: SparkSession, dir: String): DataFrame =
    gateFlags(t(s, dir, "documents"), "doc_id", "text", cfg)
      .drop("text")

  /** Frame-level face of the d54 gate (shared with the CLI curate
    * pipeline, VERDICT r17 Next #6): per-rule flags + the composite
    * `passes` verdict appended to (idCol, textCol) rows. Pure
    * map-side, one staged tokenize — the exact plan d54 has always
    * run, just parameterized over its input relation.
    */
  private[graft] def gateFlags(input: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      cfg: QualityGateConfig): org.apache.spark.sql.DataFrame = {
    val docs = input.select(col(idCol).as("doc_id"),
      col(textCol).as("text"),
      TextFunctions.tokens(col(textCol)).as("ts"))
    val r = gateRules(col("text"), col("ts"), cfg)
    docs.select(col("doc_id"), col("text"),
      r.nWords.as("n_words"), r.meanWlen.as("mean_wlen"),
      r.nStop.cast("long").as("n_stop"), r.alphaFrac.as("alpha_frac"),
      r.okWords.as("ok_words"), r.okMwl.as("ok_mwl"),
      r.okStop.as("ok_stop"), r.okAlpha.as("ok_alpha"),
      r.passes.as("passes"))
  }

  /** The gate's rule expressions over a (text, staged-tokens) pair —
    * the single definition both [[gateFlags]] (the d54 query shape) and
    * [[gatePassing]] (the curate funnel's in-place filter) evaluate, so
    * the two faces cannot drift. */
  private final case class GateRules(
      nWords: Column, meanWlen: Column, nStop: Column, alphaFrac: Column,
      okWords: Column, okMwl: Column, okStop: Column, okAlpha: Column,
      passes: Column)

  private def gateRules(text: Column, ts: Column,
      cfg: QualityGateConfig): GateRules = {
    val nWords = size(ts).cast("long")
    val totChars = sumLens(ts)
    val meanWlen = when(nWords > 0,
      totChars.cast("double") / nWords.cast("double")).otherwise(lit(0.0))
    val nStop = TextFunctions.vocabHits(text, cfg.stopwords)
    val nAlpha = size(filter(ts, w => w.rlike("[a-zA-Z]")))
    val alphaFrac = when(nWords > 0,
      nAlpha.cast("double") / nWords.cast("double")).otherwise(lit(0.0))
    val okWords = nWords >= cfg.minWords && nWords <= cfg.maxWords
    val okMwl = meanWlen >= cfg.minMeanWordLen &&
      meanWlen <= cfg.maxMeanWordLen
    val okStop = nStop >= cfg.minStopwordHits
    val okAlpha = alphaFrac >= cfg.minAlphaFrac
    GateRules(nWords, meanWlen, nStop, alphaFrac,
      okWords, okMwl, okStop, okAlpha,
      okWords && okMwl && okStop && okAlpha)
  }

  /** The gate applied IN PLACE: keep exactly the rows [[gateFlags]]
    * would flag `passes`, with every input column — rider columns
    * included — unchanged. Zero exchanges: scan → staged tokenize →
    * filter → drop the helper column (VERDICT r18 Next #3 — the curate
    * funnel's stage 1 used to gate on ids and semi-join the full corpus
    * back, a corpus-wide shuffle of text-bearing rows paid purely to
    * preserve rider columns). */
  private[graft] def gatePassing(input: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      cfg: QualityGateConfig): org.apache.spark.sql.DataFrame = {
    val tsCol = "__gate_ts"
    require(!input.columns.contains(tsCol),
      s"gatePassing stages tokens under a '$tsCol' column, which the " +
        "input already carries — rename it")
    input
      .withColumn(tsCol, TextFunctions.tokens(col(textCol)))
      .filter(gateRules(col(textCol), col(tsCol), cfg).passes)
      .drop(tsCol)
  }

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

  /** DuckDB oracle for [[dupCoverQueryFused]], generated for the same
    * widths so d53 and d55 cannot drift from each other. The oracle
    * keeps the naive quadratic duplicate test (list_filter inside
    * list_filter) ON PURPOSE: it is an independent formulation of the
    * same semantics, native-code fast at the oracle SF, and it would
    * not inherit a bug in the engine's sort+fold rewrite.
    */
  private def dupCoverSql(ns: Seq[Int]): String = {
    val gs = ns.map(n => s"${gramsSql(n)} AS gs$n")
      .mkString(",\n             ")
    val sts = ns.map(n =>
      s"""list_filter(range(1, len(gs$n) + 1),
               i -> len(list_filter(gs$n,
                 x -> x = gs$n[CAST(i AS INT)])) >= 2) AS st$n""")
      .mkString(",\n             ")
    val stPass = ns.map(n => s"st$n").mkString(", ")
    val covs = ns.map(n =>
      s"""list_distinct(flatten(list_transform(st$n,
               i -> list_transform(range(0, $n),
                 d -> CAST(i + d AS INT))))) AS cov$n""")
      .mkString(",\n             ")
    val outs = ns.map(n =>
      s"""CAST(len(st$n) AS INT) AS dup${n}_grams,
           CAST(len(cov$n) AS INT) AS dup${n}_words,
           CASE WHEN tot = 0 THEN 0.0 ELSE
             CAST(coalesce(list_sum(list_transform(cov$n,
               j -> length(ts[j]))), 0) AS DOUBLE)
               / CAST(tot AS DOUBLE) END AS dup${n}_frac""")
      .mkString(",\n           ")
    s"""$ToksCte,
         g AS (
           SELECT doc_id, ts, $gs
           FROM toks),
         d AS (
           SELECT doc_id, ts, $sts
           FROM g),
         cov AS (
           SELECT doc_id, ts, $stPass, $covs,
             coalesce(list_sum(list_transform(ts, w -> length(w))), 0)
               AS tot
           FROM d)
         SELECT doc_id, $outs
         FROM cov"""
  }

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

    "d53_dup_ngram_cover" -> dupCoverSql(Seq(2, 3)),

    "d55_dup_ngram_cover_wide" -> dupCoverSql(5 to 10),

    "d54_quality_gate" -> qualityGateSql(QualityGateConfig()))

  /** DuckDB oracle for [[qualityGateQuery]], generated from the SAME
    * [[QualityGateConfig]] instance as the Spark side — thresholds and
    * stopword list appear once in the codebase.
    */
  private[graft] def qualityGateSql(cfg: QualityGateConfig): String = {
    // SQL-escape: config stopword lists are caller-supplied, and an
    // apostrophe (e.g. "don't") would break the generated literal
    val stopList = cfg.stopwords
      .map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")
    val okWords =
      s"n_words >= ${cfg.minWords} AND n_words <= ${cfg.maxWords}"
    val okMwl = s"mean_wlen >= ${cfg.minMeanWordLen} AND " +
      s"mean_wlen <= ${cfg.maxMeanWordLen}"
    val okStop = s"n_stop >= ${cfg.minStopwordHits}"
    val okAlpha = s"alpha_frac >= ${cfg.minAlphaFrac}"
    s"""$ToksCte,
         m AS (
           SELECT doc_id,
             CAST(len(ts) AS BIGINT) AS n_words,
             coalesce(list_sum(list_transform(ts, w -> length(w))), 0)
               AS tot,
             CAST(len(list_filter(ts, w -> list_contains(
               $stopList, w)))
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
           ($okWords) AS ok_words,
           ($okMwl) AS ok_mwl,
           ($okStop) AS ok_stop,
           ($okAlpha) AS ok_alpha,
           ($okWords AND $okMwl AND $okStop AND $okAlpha) AS passes
         FROM r"""
  }
}
