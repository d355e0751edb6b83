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
    // each Lloyd iteration scans this frame once — persist across them
    val vecs = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Seeds: the k smallest-id vectors (TakeOrdered — no shuffle-sort of
    // the corpus), sliced into subvectors driver-side. Every subspace
    // seeds from the same k rows, exactly as the old per-subspace window
    // did. This is also where the dim % m contract is ENFORCED: a bad m
    // must fail loudly, not silently drop tail dimensions.
    val seeds = vecs.orderBy(col("id")).limit(k).collect()
    require(seeds.nonEmpty, "PqIndex.fit: empty corpus")
    val dim = seeds.head.getSeq[Double](1).size
    require(m > 0 && dim % m == 0,
      s"PqIndex.fit: vector dim $dim not divisible by m=$m")
    val subDim = dim / m

    // codebook on the driver between iterations (m·k·subDim doubles);
    // shipping it per round avoids the iterative-lineage trap.
    var codebook: Seq[(Int, Int, Seq[Double])] =
      for {
        (r, i) <- seeds.toSeq.zipWithIndex
        s <- 0 until m
      } yield (s, i + 1,
        r.getSeq[Double](1).slice(s * subDim, (s + 1) * subDim))

    for (_ <- 1 to iters) {
      val cb = codebook.map { case (s, c, cw) => (s, c) -> cw }.toMap
      // Assignment is a PURE PROJECTION against the driver-held codebook
      // (the same literal-argmin as [[encodeExpr]], which ties to the
      // smallest code like the old window did) — no broadcast join, no
      // per-(id, subspace) window sort. The only shuffle per iteration
      // is the partial-aggregated means groupBy.
      val means = vecs
        .select(col("v"),
          posexplode(encodeExpr(col("v"), cb)).as(Seq("subspace", "code")))
        .select(col("subspace"), col("code"),
          posexplode(slice(col("v"), col("subspace") * subDim + 1,
            lit(subDim))).as(Seq("dim", "x")))
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
    vecs.unpersist()
    codebook.toDF("subspace", "code", "codeword")
  }

  /** (id, subspace, subvector) rows — the unit ADC tables are built on.
    * The dim % m contract is enforced per row via `raise_error` so a bad
    * m fails loudly instead of silently truncating tail dimensions
    * (ADVICE r2).
    */
  private def subvectors(corpus: DataFrame, idCol: String, vecCol: String,
                         m: Int): DataFrame = {
    val n = size(col(vecCol))
    val subDim = when(n % m === 0, (n / m).cast("int"))
      .otherwise(raise_error(concat(
        lit("PqIndex: vector dim "), n.cast("string"),
        lit(s" not divisible by m=$m"))))
    val dv = transform(col(vecCol), x => x.cast("double"))
    corpus.select(col(idCol).as("id"), dv.as("v"), subDim.as("sub_dim"))
      .select(col("id"), posexplode(
        array((0 until m).map(s =>
          slice(col("v"), col("sub_dim") * s + 1, col("sub_dim"))): _*))
        .as(Seq("subspace", "sv")))
  }

  /** Encoding expression against a DRIVER-COLLECTED codebook: for each
    * subspace, the code of the nearest codeword, ties to the smallest
    * code. ONE codegen'd expression ([[graft.functions.PqEncode]]) — a
    * composed slice/l2sq/argmin tree of m·k sub-expressions exceeds
    * whole-stage codegen limits and falls back to ~0.5 ms/row
    * interpreted eval; the fused loop stays codegen'd at ~µs/row. The
    * codebook is kilobytes, so inlining it keeps encode a pure per-row
    * projection.
    */
  private def encodeExpr(vec: Column,
                         cb: Map[(Int, Int), Seq[Double]]): Column = {
    val m = cb.keys.map(_._1).max + 1
    val k = cb.keys.map(_._2).max
    val subDim = cb.head._2.size
    val flat = for (s <- 0 until m; c <- 1 to k) yield cb((s, c))
    VectorFunctions.pqEncode(vec, m, subDim, flat)
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
             codebook: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val cb = codebook.collect().map { r =>
      (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)
    }.toMap
    // no transform-to-double wrapper: VectorL2SqWindow reads float
    // elements directly (casting per element — identical values), and a
    // transform expression here would be RE-EVALUATED by every one of
    // the m·k distance terms after projection collapse.
    corpus.select(col(idCol).as("id") +: keep.map(col) :+
      encodeExpr(col(vecCol), cb).as("codes"): _*)
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
                                 k: Int,
                                 joinKeys: Seq[String] =
                                   Seq("query_id", "subspace", "code"))
      : DataFrame = {
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist").asc, col("id"))
    candidates.join(broadcast(table), joinKeys)
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
