package graft

import graft.operators.{IvfIndex, IvfPq, PqIndex, Similarity}
import org.apache.spark.sql.functions._

/** Residual IVF-PQ (IVFADC layout): PQ codes quantize (v − centroid)
  * instead of v. Asserts the property that justifies the layout —
  * strictly tighter reconstructions from the same code budget when
  * coarse cells differ in location — plus determinism and end-to-end
  * search parity with exact search on clustered data.
  */
class IvfPqResidualSpec extends SparkSpec {
  import spark.implicits._

  // ids interleaved across clusters (id % 3 = cluster) so smallest-id
  // seeding lands in three different clusters — same fixture discipline
  // as PqIndexSpec's IVF-PQ test
  private def clustered() = {
    val centers = Seq(
      Array.fill(8)(10.0f),
      Array.fill(8)(-10.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 10.0f else -10.0f))
    val rows = for {
      j <- 0 until 4
      (c, ci) <- centers.zipWithIndex
    } yield ((j * 3 + ci).toLong,
      c.zipWithIndex.map { case (x, i) => x + 0.1f * j * (1 + i % 3) })
    rows.toDF("vec_id", "embedding")
  }

  /** Mean squared reconstruction error of a coding, computed driver-side
    * on the tiny fixture: decode = codeword per subspace, error =
    * Σ‖target_sub − codeword‖².
    */
  private def msError(target: Map[Long, Seq[Double]],
                      codes: Map[Long, Seq[Int]],
                      cb: Map[(Int, Int), Seq[Double]]): Double = {
    val errs = target.map { case (id, v) =>
      val subDim = v.size / codes(id).size
      codes(id).zipWithIndex.map { case (c, s) =>
        val cw = cb((s, c))
        v.slice(s * subDim, (s + 1) * subDim).zip(cw)
          .map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    }
    errs.sum / errs.size
  }

  private def collectVecs(df: org.apache.spark.sql.DataFrame,
                          vecCol: String): Map[Long, Seq[Double]] =
    df.select(col("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("residual codes reconstruct tighter than absolute codes") {
    val df = clustered()
    val centroids = IvfIndex.fit(df, "vec_id", "embedding", k = 3, iters = 3)

    // plain PQ on absolute vectors
    val cbPlain = PqIndex.fit(df, "vec_id", "embedding", m = 4, k = 3,
      iters = 3)
    val plainCodes = PqIndex.encode(df, "vec_id", "embedding", cbPlain)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val plainCb = cbPlain.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val plainErr = msError(collectVecs(df, "embedding"), plainCodes, plainCb)

    // residual PQ with the SAME m·k budget
    val res = IvfPq.residuals(df, "vec_id", "embedding", centroids)
      .withColumnRenamed("id", "vec_id")
    val cbRes = IvfPq.fitResidual(df, "vec_id", "embedding", centroids,
      m = 4, kCodes = 3)
    val resCodes = IvfPq.indexResidual(df, "vec_id", "embedding",
      centroids, cbRes)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    val resCb = cbRes.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val resErr = msError(collectVecs(res, "rv"), resCodes, resCb)

    // residuals are re-centered per cell: same budget, tighter codes
    assert(resErr < plainErr,
      s"residual MSE $resErr should beat absolute MSE $plainErr")
  }

  test("residual index is deterministic") {
    val df = clustered()
    val centroids = IvfIndex.fit(df, "vec_id", "embedding", k = 3, iters = 3)
    val cb = IvfPq.fitResidual(df, "vec_id", "embedding", centroids,
      m = 4, kCodes = 3)
    def codes() = IvfPq.indexResidual(df, "vec_id", "embedding",
      centroids, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
      .sortBy(_._1).toSeq
    assert(codes() == codes())
  }

  test("residual search finds the home cluster through probed lists") {
    val df = clustered()
    val centroids = IvfIndex.fit(df, "vec_id", "embedding", k = 3, iters = 3)
    val cb = IvfPq.fitResidual(df, "vec_id", "embedding", centroids,
      m = 4, kCodes = 3)
    val indexed = IvfPq.indexResidual(df, "vec_id", "embedding",
      centroids, cb)
    val res = IvfPq.searchResidual(indexed,
      df.filter(col("vec_id") === 0L), "vec_id", "embedding",
      centroids, cb, k = 3, nProbe = 1)
      .orderBy("rank").collect()
    assert(res.length == 3)
    // cluster 0 is ids ≡ 0 (mod 3): 3, 6, 9
    assert(res.map(_.getLong(1)).toSet == Set(3L, 6L, 9L))
  }

  test("residual ADC distance approximates true distance per candidate") {
    val df = clustered()
    val centroids = IvfIndex.fit(df, "vec_id", "embedding", k = 3, iters = 3)
    val cb = IvfPq.fitResidual(df, "vec_id", "embedding", centroids,
      m = 4, kCodes = 3)
    val indexed = IvfPq.indexResidual(df, "vec_id", "embedding",
      centroids, cb)
    val approx = IvfPq.searchResidual(indexed,
      df.filter(col("vec_id") === 0L), "vec_id", "embedding",
      centroids, cb, k = 3, nProbe = 1).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val vecs = collectVecs(df, "embedding")
    approx.foreach { case (nid, ad) =>
      val truth = math.sqrt(vecs(0L).zip(vecs(nid))
        .map { case (a, b) => (a - b) * (a - b) }.sum)
      // within-cluster jitter is ≤ ~1.2 per dim; ADC error stays small
      assert(math.abs(ad - truth) < 2.0,
        s"neighbor $nid: approx $ad vs true $truth")
    }
  }
}
