package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document repeated-substring detection — the exact-substring
  * dedup modality (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL 2022: repeated long character runs are
  * the duplication token-shingle and edit-distance methods both miss —
  * a 60-char boilerplate footer inside otherwise-distinct documents
  * never lifts whole-set Jaccard above threshold and never brings whole
  * heads within edit distance k).
  *
  * Two faces, the d24/d45 anchor-vs-scale discipline:
  *
  *  - [[repeatedGramDocs]] enumerates EVERY fixed-length gram — the
  *    honest corpus-pass anchor whose cost is O(corpus·L) shuffled
  *    bytes, oracle-checkable gram-for-gram;
  *  - [[longRepeatPairs]] is the scale path: winnowed fingerprints
  *    ([[graft.functions.Winnow]]) shuffle only ~2/(w+1) of positions
  *    as 16-byte rows, pairs form ONLY where a selected fingerprint
  *    hash matches (never all-pairs, never all-positions), and full
  *    texts are fetched once per candidate id for verification — yet
  *    the result is EXACT for the ≥ k+w−1 contract by the winnowing
  *    guarantee, so it shares a DuckDB all-grams oracle with the
  *    anchor. The reference
  *    (`/root/reference/datagouv_tools`) has no similarity machinery
  *    at all; both faces derive from the cited papers.
  */
object SubstrDedup {

  /** Winnowed fingerprint relation: one (id, pos, h) row per SELECTED
    * k-gram position, k = minLen − w + 1. `pos` is the 1-based
    * codepoint position (feedable to `substr`), `h` the 32-bit mixed
    * gram hash as an unsigned value in a long.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   minLen: Int, w: Int): DataFrame = {
    val k = minLen - w + 1
    require(k >= 1, s"minLen=$minLen must be >= w=$w")
    docs
      .select(col(idCol),
        explode(graft.functions.Winnow
          .winnowFingerprints(col(textCol), k, w)).as("_f"))
      .select(col(idCol),
        shiftright(col("_f"), 32).cast("int").as("_pos"),
        col("_f").bitwiseAND(lit(0xffffffffL)).as("_h"))
  }

  /** EXACT: all distinct `L`-codepoint substrings occurring in ≥ 2
    * distinct documents, with the distinct-document count — the
    * all-positions anchor. Every position of every document becomes a
    * gram row, so the shuffle is O(corpus·L) bytes by construction;
    * this is the d24-style honest corpus pass that pins the scale
    * path's semantics, not the shape to run at 100 TB (that is
    * [[longRepeatPairs]], which shuffles winnowed 16-byte rows
    * instead of L-byte gram strings).
    */
  def repeatedGramDocs(docs: DataFrame, idCol: String, textCol: String,
                       L: Int): DataFrame = {
    require(L >= 1, s"gram length must be >= 1, got $L")
    docs
      .filter(length(col(textCol)) >= L)
      .select(col(idCol), explode(
        transform(sequence(lit(1), length(col(textCol)) - (L - 1)),
          p => col(textCol).substr(p, lit(L)))).as("gram"))
      .groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= 2)
  }

  /** Covered start positions under the KEEP-FIRST policy: (id, p) rows
    * where the L-gram starting at codepoint p of document id also
    * occurs in some document with a SMALLER id. Computed linearly — per
    * gram only its MINIMUM document id is aggregated and joined back,
    * so a boilerplate gram shared by d documents costs d rows, never
    * d² (the naive gram self-join would square on exactly the hot
    * grams this operator exists to find).
    */
  def coveredStarts(docs: DataFrame, idCol: String, textCol: String,
                    L: Int): DataFrame = {
    val g = docs.filter(length(col(textCol)) >= L)
      .select(col(idCol).as("_id"),
        explode(transform(
          sequence(lit(1), length(col(textCol)) - (L - 1)),
          p => struct(p.as("p"),
            col(textCol).substr(p, lit(L)).as("g")))).as("_pg"))
      .select(col("_id"), col("_pg.p").as("p"), col("_pg.g").as("g"))
    val minDoc = g.groupBy(col("g")).agg(min(col("_id")).as("_min"))
    g.join(minDoc, Seq("g"))
      .filter(col("_min") < col("_id"))
      .select(col("_id"), col("p"))
  }

  /** The exact-substring CUT (the operation Lee et al.'s ExactSubstr
    * dedup performs on a training corpus): every codepoint covered by
    * some L-gram shared with a smaller-id document is removed, and the
    * remaining segments are re-concatenated in order. Keep-first is the
    * deterministic survivorship policy — the smallest id holding a run
    * keeps it intact (same-document self-repeats also survive there),
    * every later document sheds it — so the output is a pure function
    * of the corpus, independent of partitioning, and oracle-checkable
    * character for character.
    *
    * Shape: [[coveredStarts]] is linear in corpus grams (min-id per
    * gram, joined back); start positions then collapse to ONE sorted
    * array per affected document, and the cut itself is a single
    * `aggregate` fold over that array — interval-merging cursor
    * arithmetic plus `substr` slices, no per-character explosion, no
    * UDF. Documents with nothing to cut pass through the left join
    * untouched.
    */
  def cleanText(docs: DataFrame, idCol: String, textCol: String,
                L: Int): DataFrame = {
    val starts = coveredStarts(docs, idCol, textCol, L)
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(col("p"))).as("_ss"))
    val txt = col(textCol)
    docs.join(starts, col(idCol) === col("_id"), "left")
      .withColumn("clean_text",
        when(col("_ss").isNull, txt).otherwise(aggregate(
          col("_ss"),
          struct(lit("").as("out"), lit(1).as("cur")),
          (acc, s) => {
            val out = acc.getField("out")
            val cur = acc.getField("cur")
            struct(
              when(s > cur,
                concat(out, txt.substr(cur, s - cur)))
                .otherwise(out).as("out"),
              greatest(cur, s + lit(L)).as("cur"))
          },
          acc => concat(acc.getField("out"),
            txt.substr(acc.getField("cur"),
              greatest(length(txt) - acc.getField("cur") + 1, lit(0)))))))
      .select(col(idCol), col("clean_text"))
  }

  /** EXACT distinct (id_a < id_b) pairs of documents sharing at least
    * one substring of ≥ `minLen` code points, computed at winnowed
    * cost. Three stages:
    *
    *  1. fingerprint join on the 32-bit gram hash — by the winnowing
    *     guarantee every qualifying pair surfaces here (both sides
    *     select the shared window's rightmost-min gram), and density
    *     2/(w+1) bounds the shuffled volume;
    *  2. anchors grouped per pair (`collect_list` of position pairs),
    *     so each candidate pair carries its evidence in ONE row and
    *     the text join below runs once per pair, not once per anchor;
    *  3. verification against real text: an anchor at (pa, pb) proves
    *     the pair iff some alignment d ∈ [0, w) yields
    *     `substr(ta, pa−d, minLen) = substr(tb, pb−d, minLen)` — for a
    *     true shared run the fingerprint sits at most w−1 grams past
    *     the run's start at the SAME offset on both sides, so that d
    *     exists; conversely any passing d exhibits the run. Bounds
    *     guards keep truncated substr results from comparing equal.
    *     Hash collisions (2⁻³²) die here at the cost of one check.
    *
    * Texts are fetched ONLY for candidate ids (semi-join prune) and the
    * two text joins are hinted shuffled-hash for the same reason as
    * [[PpJoin]]'s band verification: the build side holds each
    * candidate's text once and pair rows never drag text payloads
    * through a sort buffer.
    */
  def longRepeatPairs(docs: DataFrame, idCol: String, textCol: String,
                      minLen: Int = 59, w: Int = 20): DataFrame = {
    val d = docs.select(col(idCol).as("_did"), col(textCol).as("_txt"))
    val fp = fingerprints(docs, idCol, textCol, minLen, w)
    val a = fp.select(col("_h"), col(idCol).as("id_a"),
      col("_pos").as("pa"))
    val b = fp.select(col("_h"), col(idCol).as("id_b"),
      col("_pos").as("pb"))
    val cand = a.join(b, Seq("_h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(collect_list(struct(col("pa"), col("pb"))).as("anchors"))
      .localCheckpoint(true) // feeds the id union AND the verify join
    val candIds = cand.select(col("id_a").as("_cid"))
      .unionByName(cand.select(col("id_b").as("_cid")))
      .distinct()
    val texts = d.join(candIds, col("_did") === col("_cid"), "left_semi")
    cand
      .join(texts.select(col("_did").as("id_a"), col("_txt").as("ta"))
        .hint("shuffle_hash"), Seq("id_a"))
      .join(texts.select(col("_did").as("id_b"), col("_txt").as("tb"))
        .hint("shuffle_hash"), Seq("id_b"))
      .filter(exists(col("anchors"), an => {
        val pa = an.getField("pa")
        val pb = an.getField("pb")
        exists(sequence(lit(0), lit(w - 1)), dd =>
          (pa > dd) && (pb > dd) &&
            (pa - dd + (minLen - 1) <= length(col("ta"))) &&
            (pb - dd + (minLen - 1) <= length(col("tb"))) &&
            (col("ta").substr(pa - dd, lit(minLen)) ===
              col("tb").substr(pb - dd, lit(minLen))))
      }))
      .select(col("id_a"), col("id_b"))
  }
}
