package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for memory-bound ANN search: each vector is
  * split into `m` subvectors; each subspace gets its own `k`-entry
  * codebook (k-means); a vector is stored as `m` small codes instead of
  * `dim` floats. Search uses asymmetric distance computation (ADC): the
  * query stays exact, per-subspace distances to every codeword are
  * computed once per query into a lookup table, and a candidate's
  * approximate distance is the sum of `m` table lookups.
  *
  * Scale shape: the codebook is m·k·(dim/m) doubles — kilobytes — so it
  * trains on a sample, lives broadcast, and encoding is map-side with no
  * shuffle. The encoded corpus is ~dim·4/m× smaller than raw vectors
  * (e.g. 64-dim float → 8 codes = 32× compression), which is what lets a
  * 100 TB embedding corpus fit hot storage. ADC joins the (id, subspace,
  * code) triples against a broadcast per-query table and sums partials —
  * one partial-aggregated shuffle keyed (query, id), never a shuffle of
  * the raw vectors. Compose with [[IvfIndex]] (IVF-PQ) to also prune the
  * candidate set.
  *
  * Determinism: same seeding discipline as [[IvfIndex.fit]] — initial
  * codewords come from the vectors with the k smallest ids, iterations
  * are fixed-count, no RNG anywhere.
  */
object PqIndex {

  /** Rotated-PQ ("OPQ-lite") preprocessing: apply the deterministic
    * Walsh–Hadamard rotation to the vector column so subspace energy is
    * balanced before codebook training/encoding. Rotation is orthonormal
    * — L2 distances are preserved exactly — so fit/encode/search work
    * unchanged on the rotated frame; queries must pass through the SAME
    * rotation. `dim` must be a power of 2.
    */
  def rotate(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.withColumn(vecCol,
      graft.functions.VectorFunctions.rotateHadamard(col(vecCol), dim))

  /** Train per-subspace codebooks. Returns a small DataFrame
    * (subspace, code, codeword: array<double>) — broadcastable.
    * `dim` must be divisible by `m`.
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
          m: Int, k: Int, iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val subs = subvectors(corpus, idCol, vecCol, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // codebook on the driver between iterations (m·k·subDim doubles);
    // shipping it per round avoids the iterative-lineage trap. Seeds:
    // each subspace's codewords start from the k smallest-id subvectors.
    var codebook: Seq[(Int, Int, Seq[Double])] =
      subs.withColumn("rn", row_number().over(
        Window.partitionBy(col("subspace")).orderBy(col("id"))))
        .filter(col("rn") <= k)
        .select(col("subspace"), col("rn"), col("sv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq

    for (_ <- 1 to iters) {
      val cdf = codebook.toDF("subspace", "code", "codeword")
      val means = assignCodes(subs, cdf)
        .select(col("subspace"), col("code"),
          posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy(col("subspace"), col("code"), col("dim"))
        .agg(avg(col("x")).as("mean"))
        .groupBy(col("subspace"), col("code"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mean"))))
          .as("pairs"))
        .select(col("subspace"), col("code"),
          transform(col("pairs"), p => p.getField("mean")).as("cw"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      codebook = codebook.map { case (s, c, old) =>
        (s, c, means.getOrElse((s, c), old))
      }
    }
    subs.unpersist()
    codebook.toDF("subspace", "code", "codeword")
  }

  /** (id, subspace, subvector) rows — the unit PQ trains/encodes on. */
  private def subvectors(corpus: DataFrame, idCol: String, vecCol: String,
                         m: Int): DataFrame = {
    val dv = transform(col(vecCol), x => x.cast("double"))
    corpus.select(col(idCol).as("id"), dv.as("v"),
      (size(col(vecCol)) / m).as("sub_dim"))
      .select(col("id"), posexplode(
        array((0 until m).map(s =>
          slice(col("v"), col("sub_dim") * s + 1, col("sub_dim"))): _*))
        .as(Seq("subspace", "sv")))
  }

  /** Nearest codeword per (id, subspace) — broadcast codebook, map-side
    * except the top-1 window per (id, subspace). Used only by [[fit]],
    * which trains on a SAMPLE at scale, so the window sort is bounded by
    * sample size; the corpus-wide path is the map-side [[encode]]. (An
    * all-literal when-chain variant benched slower here: the m·k-node
    * expression tree blows past efficient codegen for no shuffle saved
    * on a sample.)
    */
  private def assignCodes(subs: DataFrame, codebook: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id"), col("subspace"))
      .orderBy(col("d2").asc, col("code"))
    subs.join(broadcast(codebook), Seq("subspace"))
      .withColumn("d2", VectorFunctions.l2Sq(col("sv"), col("codeword")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("subspace"), col("sv"), col("code"))
  }

  /** Encoding expression against a DRIVER-COLLECTED codebook: for each
    * subspace, the (1-based) position of the nearest codeword in an
    * inline distance array. Ties break to the smallest code
    * (`array_position` returns the first minimum), matching
    * [[assignCodes]]'s (d2, code) ordering. The codebook is kilobytes,
    * so inlining it makes encode a pure per-row projection.
    */
  private def encodeExpr(vec: Column,
                         cb: Map[(Int, Int), Seq[Double]]): Column = {
    val m = cb.keys.map(_._1).max + 1
    val subDim = cb.head._2.size
    array((0 until m).map { s =>
      val sub = slice(vec, lit(s * subDim + 1), lit(subDim))
      val codewords = cb.keys.filter(_._1 == s).map(_._2).toSeq.sorted
        .map(code => cb((s, code)))
      val dists = array(codewords.map(cw =>
        VectorFunctions.l2Sq(sub, typedLit(cw))): _*)
      array_position(dists, array_min(dists)).cast("int")
    }: _*)
  }

  /** Encode the corpus: (id, codes array<int> ordered by subspace).
    *
    * ZERO-SHUFFLE: the codebook collapses to plan-time literals (m·k
    * codewords — kilobytes), so encoding is a map-side projection. This
    * is also what makes it run unchanged on an UNBOUNDED stream (see
    * `EventStreamsSpec`): no aggregation, no state — new vectors encode
    * as they arrive, the streaming half of index maintenance.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             codebook: DataFrame): DataFrame = {
    val cb = codebook.collect().map { r =>
      (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)
    }.toMap
    val dv = transform(col(vecCol), x => x.cast("double"))
    corpus.select(col(idCol).as("id"), encodeExpr(dv, cb).as("codes"))
  }

  /** Per-query ADC lookup table (query_id, subspace, code, partial d²):
    * queries × m × k rows — small, broadcastable. Shared by [[search]]
    * and [[IvfPq]].
    */
  def adcTable(queries: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame): DataFrame = {
    val m = codebook.agg(max(col("subspace"))).head().getInt(0) + 1
    subvectors(queries, idCol, vecCol, m)
      .withColumnRenamed("id", "query_id")
      .join(codebook, Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("code"),
        VectorFunctions.l2Sq(col("sv"), col("codeword")).as("pd2"))
  }

  /** Shared ADC scoring tail: candidate (query_id, id, subspace, code)
    * rows joined with the partial-distance table, summed per candidate,
    * top-k per query. Used by [[search]] and [[IvfPq.search]] so the
    * tie-break / distance arithmetic can never diverge between them.
    */
  private[operators] def adcTopK(candidates: DataFrame, table: DataFrame,
                                 k: Int): DataFrame = {
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist").asc, col("id"))
    candidates.join(broadcast(table), Seq("query_id", "subspace", "code"))
      .groupBy(col("query_id"), col("id"))
      .agg(sqrt(sum(col("pd2"))).as("approx_dist"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("approx_dist"), col("rank"))
  }

  /** ADC top-k: approximate L2 distance = Σ_subspaces ‖q_s − cw(code_s)‖².
    * `queries` is small (broadcast); the encoded corpus never re-reads
    * the raw vectors.
    */
  def search(encoded: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, codebook: DataFrame, k: Int): DataFrame = {
    val table = adcTable(queries, idCol, vecCol, codebook)
    val triples = encoded.select(col("id"),
      posexplode(col("codes")).as(Seq("subspace", "code")))
    adcTopK(triples.crossJoin(
      broadcast(table.select(col("query_id")).distinct())), table, k)
  }
}
