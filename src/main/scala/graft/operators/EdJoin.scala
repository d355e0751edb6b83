package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact bounded edit-distance self-join (fuzzy entity matching),
  * candidate-bounded by a content-based q-gram prefix filter in the
  * style of Ed-Join (Xiao, Wang & Lin, "Ed-Join: an efficient algorithm
  * for similarity joins with edit distance constraints", VLDB 2008) —
  * the edit-distance sibling of [[PpJoin]], sharing its DF-ordering
  * architecture.
  *
  * Naive fuzzy joins are quadratic; segment-based blocking (PassJoin)
  * degenerates when a fixed segment position lands on a shared prefix
  * ("Customer#0000…" — every string collides on segment 1). The q-gram
  * prefix filter dodges exactly that: a single edit operation damages at
  * most q of a string's positional q-grams, so at most q DISTINCT grams
  * leave its gram SET (a distinct gram survives while any occurrence
  * does). Hence ed(A,B) ≤ k ⟹ |set(A) ∩ set(B)| ≥ max(mA, mB) − k·q,
  * and by the same prefix-filter lemma PpJoin proves, the first
  * k·q + 1 grams of each string under ONE global order — ascending
  * corpus document frequency, ties by gram — must intersect. A
  * shared-prefix gram has maximal DF, lands at the END of the order,
  * and never enters any prefix: the hot-block failure mode is pruned
  * exactly, not heuristically.
  *
  * Scale shape: two linear shuffles (gram DF count; per-string rarity
  * window), a self-join over ≤ k·q + 1 grams per string whose key fanout
  * is bounded by rare-gram DF, then threshold-bounded Levenshtein
  * (early-exit `levenshtein(l, r, k)`, O(k·min(len)) per pair) on
  * candidates only. The length gate |lenA − lenB| ≤ k prunes before the
  * distance runs. Verification is ordered so the candidate stream never
  * touches a shuffle: strings ride along the prefix index, the bounded
  * distance runs inside the streamed join output, and only SURVIVING
  * pairs are deduplicated — on adversarial corpora candidates outnumber
  * matches by orders of magnitude, so a pre-verification distinct would
  * shuffle the candidate set (the dominant cost) instead of the result.
  * The indexed side is explicitly re-spread across cores first: the
  * verification cost is CPU per pair, not bytes, so byte-based AQE
  * coalescing would otherwise serialize it onto a handful of tasks.
  *
  * The gram-set bound is vacuous for SHORT strings: with at most k·q
  * distinct grams on both sides, k edits can destroy every shared gram
  * ("abcdef" vs "aXcdYf" is ed=2 with zero common 3-grams), so the
  * gram join alone would miss true pairs. Strings in that class have
  * length ≤ k·q + q − 1 — a constant-bounded corpus slice — and go
  * through an exhaustive length-banded side path (band width k+1, both
  * sides emit {base, base+1}, pair kept on the max base so the double
  * hit dedupes); short×long needs no special casing because the
  * asymmetric bound |A∩B| ≥ max(mA,mB) − k·q ≥ 1 already holds when
  * the longer side clears k·q grams.
  *
  * CONTRACT: strings shorter than q carry no q-gram and are EXCLUDED
  * from the join (documented fuzzy-matching floor; pad upstream if
  * sub-q strings are meaningful). Verification is exact, so the filter
  * chain is correctness-neutral — [[EdJoinSpec]] proves equality with
  * the naive quadratic join on randomized and adversarial corpora,
  * including zero-shared-gram short pairs.
  */
object EdJoin {

  /** EXACT {(id_a, id_b, dist) | id_a < id_b, ed ≤ k} over
    * (id, string) rows, strings of length ≥ q. dist is the true edit
    * distance (IntegerType).
    */
  def editPairs(strs: DataFrame, idCol: String, strCol: String,
                k: Int, q: Int = 3): DataFrame = {
    require(k >= 1, s"edit-distance threshold k must be >= 1, got $k")
    require(q >= 1, s"gram width q must be >= 1, got $q")
    val s = strs.select(col(idCol).as("_id"), col(strCol).as("_str"))
      .filter(length(col("_str")) >= q)
    // distinct positional q-grams, projected to gram SETS (the lemma
    // counts distinct grams; occurrences would inflate m and weaken
    // the k·q bound)
    val grams = s.select(col("_id"), explode(array_distinct(
        expr(s"transform(sequence(1, length(_str) - ${q - 1})," +
          s" i -> substring(_str, i, $q))"))).as("gram"))
    val dfreq = grams.groupBy(col("gram")).agg(count(lit(1)).as("gram_df"))
    val byRarity = Window.partitionBy(col("_id"))
      .orderBy(col("gram_df"), col("gram"))
    // strings ride along the prefix index so candidates verify inline
    val prefix = grams.join(dfreq, Seq("gram"))
      .withColumn("pos", row_number().over(byRarity))
      .filter(col("pos") <= k * q + 1)
      .select(col("_id"), col("gram"))
      .join(s.withColumn("_len", length(col("_str"))), Seq("_id"))
    val n = strs.sparkSession.sparkContext.defaultParallelism
    val a = prefix
      .select(col("gram"), col("_id").as("id_a"), col("_str").as("sa"),
        col("_len").as("la"))
      // explicit width: AQE must not byte-coalesce the CPU-dense side
      .repartition(n, col("id_a"))
    val b = prefix
      .select(col("gram"), col("_id").as("id_b"), col("_str").as("sb"),
        col("_len").as("lb"))
    val gramPairs = a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("la") - col("lb")) <= k)
      .select(col("id_a"), col("id_b"), col("sa"), col("sb"))
    // short-class side path: both strings holding ≤ k·q distinct grams
    // can be within k edits with ZERO shared grams (scaladoc example),
    // so they pair exhaustively inside length bands — the class is
    // length-bounded (≤ k·q + q − 1 chars), so the band blocks stay a
    // constant-size corpus slice at any scale
    val m = grams.groupBy(col("_id")).agg(count(lit(1)).as("_m"))
    val w = k + 1 // band width > k: lengths within k differ ≤ 1 in base
    val shorts = s.join(m, Seq("_id")).filter(col("_m") <= k * q)
      .withColumn("_len", length(col("_str")))
      .withColumn("_base", expr(s"CAST(_len div $w AS INT)"))
      .withColumn("_bkt", explode(array(col("_base"), col("_base") + 1)))
    val sa = shorts.select(col("_bkt"), col("_id").as("id_a"),
      col("_str").as("sa"), col("_len").as("la"), col("_base").as("ba"))
    val sb = shorts.select(col("_bkt").as("_bktb"), col("_id").as("id_b"),
      col("_str").as("sb"), col("_len").as("lb"), col("_base").as("bb"))
    val shortPairs = sa.join(sb,
        col("_bkt") === col("_bktb")
          && col("id_a") < col("id_b")
          && abs(col("la") - col("lb")) <= k
          // keep only the match on the larger base: the {base, base+1}
          // double emission otherwise finds same-base pairs twice
          && col("_bkt") === greatest(col("ba"), col("bb")))
      .select(col("id_a"), col("id_b"), col("sa"), col("sb"))
    gramPairs.union(shortPairs)
      // 3-arg levenshtein early-exits past k and returns -1 beyond it;
      // it runs inside the streamed join output — a pair sharing several
      // prefix grams is verified once per share, which is cheaper than
      // shuffling the candidate set to dedup it first
      .withColumn("dist", levenshtein(col("sa"), col("sb"), k))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
      .distinct()
  }

  /** EXACT small-threshold variant of [[editPairs]] via k-deletion
    * neighborhoods (FastSS — Bocek, Hunt & Stiller, "Fast Similarity
    * Search in Large Dictionaries", U. Zurich TR 2007): every string
    * emits each variant reachable by deleting ≤ k characters, hashed to
    * a 64-bit key; an optimal alignment of any pair within ed ≤ k
    * matches on the characters untouched by its ≤ k edit positions, so
    * deleting those positions from each side yields EQUAL variants —
    * the neighborhoods of a true pair always intersect (candidates ⊇
    * truth; bounded levenshtein then keeps exactly the true pairs, so a
    * 64-bit hash collision can only add a candidate, never an answer).
    *
    * This is the complement of the q-gram path, not a replacement: the
    * gram filter's selectivity collapses when a corpus DENSIFIES inside
    * a fixed gram space (measured on 10× key-shifted customer names:
    * posting lists grow with n, candidates with n² — 28× wall at 10×
    * data), while deletion variants lengthen with the string, so their
    * postings track true-neighbor density and candidates scale with the
    * OUTPUT. The price is key fan-out — 1 + n + C(n,2) variants per
    * string at k=2 — so this path fits short strings (ids, names,
    * titles) at k ≤ 2, and [[editPairs]] fits long strings where k·q+1
    * prefixes stay small relative to the gram count.
    */
  def editPairsByDeletion(strs: DataFrame, idCol: String, strCol: String,
                          k: Int): DataFrame = {
    val keyed = deletionKeys(strs, idCol, strCol, k)
    val n = strs.sparkSession.sparkContext.defaultParallelism
    val a = keyed.select(col("_key"), col("_id").as("id_a"),
        col("_str").as("sa"))
      // explicit width: AQE must not byte-coalesce the CPU-dense side
      .repartition(n, col("id_a"))
    val b = keyed.select(col("_key"), col("_id").as("id_b"),
      col("_str").as("sb"))
    a.join(b, Seq("_key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb"), k))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
      .distinct()
  }

  /** (_id, _str, _key) deletion-neighborhood rows: one 64-bit hashed
    * ≤k-deletion variant per row. Shared by the batch self-join and the
    * streaming probe so batch and stream candidate verdicts cannot
    * silently diverge (the [[graft.operators.Dedup]] `bandedIndex`
    * discipline).
    */
  def deletionKeys(strs: DataFrame, idCol: String, strCol: String,
                   k: Int): DataFrame = {
    require(k >= 1 && k <= 2,
      s"deletion-neighborhood join is for k in [1, 2], got $k " +
        "(variants per string grow as C(len, k) — use editPairs beyond)")
    val s = strs.select(col(idCol).as("_id"), col(strCol).as("_str"))
    // ≤1-deletion variants: the string itself (i = 0) plus each single
    // deletion; ≤2 composes a second deletion pass over the first
    def del1(x: String, v: String) =
      s"transform(sequence(0, length($x)), $v -> if($v = 0, $x," +
        s" concat(substring($x, 1, $v - 1)," +
        s" substring($x, $v + 1, length($x)))))"
    val variants =
      if (k == 1) expr(del1("_str", "i"))
      else expr(s"flatten(transform(${del1("_str", "i")}," +
        s" v -> ${del1("v", "j")}))")
    s.select(col("_id"), col("_str"),
        explode(array_distinct(variants)).as("_v"))
      .select(col("_id"), col("_str"), xxhash64(col("_v")).as("_key"))
  }

  /** Character-level near-dup probe ON INGEST: each micro-batch's
    * strings are checked against a PINNED corpus deletion-neighborhood
    * index — the streaming face of [[editPairsByDeletion]], completing
    * the curation-at-the-door family (MinHash near-dup, exact-substring
    * decontam, LM quality) with the modality that catches
    * single-character edits token methods miss.
    *
    * Scale shape: stateless per batch — variant keys for the BATCH side
    * only (tiny), one equi-join against the static index (a bucketed
    * build side at scale), bounded levenshtein on candidates, min-dist
    * dedup per (new, corpus) pair. No watermark or state store; the
    * at-least-once + batchId-idempotent-sink contract is the same one
    * `DedupStreamSpec`/`DecontamStreamSpec` prove for the family.
    *
    * `staticKeys` is [[deletionKeys]] output for the corpus, built with
    * the SAME k; pin it (FrameCache) so micro-batches never re-derive
    * the corpus side. Emits (new_id, corpus_id, dist).
    */
  def editProbeStream(stream: DataFrame, idCol: String, strCol: String,
                      staticKeys: DataFrame, k: Int, checkpoint: String)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    val corpus = staticKeys.select(col("_key"),
      col("_id").as("corpus_id"), col("_str").as("corpus_str"))
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val probes = deletionKeys(
            batch.select(col(idCol), col(strCol)), idCol, strCol, k)
          .select(col("_key"), col("_id").as("new_id"),
            col("_str").as("new_str"))
        val hits = probes.join(corpus, Seq("_key"))
          .filter(col("new_id") =!= col("corpus_id"))
          .withColumn("dist",
            levenshtein(col("new_str"), col("corpus_str"), k))
          .filter(col("dist") >= 0)
          .groupBy(col("new_id"), col("corpus_id"))
          .agg(min(col("dist")).as("dist"))
        sink(hits, batchId)
      }
  }
}
