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
  * CONTRACT: strings shorter than q carry no q-gram and are EXCLUDED
  * from the join (documented fuzzy-matching floor; pad upstream if
  * sub-q strings are meaningful). Verification is exact, so the filter
  * chain is correctness-neutral — [[EdJoinSpec]] proves equality with
  * the naive quadratic join on randomized and adversarial corpora.
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
    a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("la") - col("lb")) <= k)
      // 3-arg levenshtein early-exits past k and returns -1 beyond it;
      // it runs inside the streamed join output — a pair sharing several
      // prefix grams is verified once per share, which is cheaper than
      // shuffling the candidate set to dedup it first
      .withColumn("dist", levenshtein(col("sa"), col("sb"), k))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
      .distinct()
  }
}
