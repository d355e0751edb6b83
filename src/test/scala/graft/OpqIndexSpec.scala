package graft

import graft.operators.{OpqIndex, PqIndex}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Learned OPQ: the alternating Lloyd/Procrustes optimization must (a)
  * produce an orthonormal rotation, (b) never lose to identity-rotation
  * PQ at the same budget, (c) beat it clearly on anisotropic data where
  * subspace energy is unbalanced, and (d) stay deterministic.
  */
class OpqIndexSpec extends SparkSpec {
  import spark.implicits._

  /** 8-dim corpus built from 4 independent factors, each DUPLICATED
    * into two dims that land in DIFFERENT axis-aligned subspaces:
    * x = (a, b, b, c, c, d, d, a). Under identity every 2-dim subspace
    * sees two independent factors (intrinsic dim 2 → k-means error
    * ∝ k^(−1)); a rotation that sums each duplicate pair into one
    * coordinate leaves every subspace a single factor plus a
    * near-constant dim (intrinsic dim 1 → error ∝ k^(−2)). Quantization
    * is rotation-invariant WITHIN a subspace, so only this
    * cross-subspace de-correlation — the thing OPQ learns — can win.
    */
  private def anisotropic() = {
    val rows = (0 until 48).map { i =>
      val a = math.sin(i * 1.7) * 10.0
      val b = math.cos(i * 2.3) * 10.0
      val c = math.sin(i * 0.9 + 1.0) * 10.0
      val d = math.cos(i * 1.3 + 2.0) * 10.0
      val e = 0.03
      (i.toLong, Array(
        a + e * math.sin(i * 7.0), b + e * math.cos(i * 5.0),
        b + e * math.sin(i * 3.0), c + e * math.cos(i * 11.0),
        c + e * math.sin(i * 13.0), d + e * math.cos(i * 17.0),
        d + e * math.sin(i * 19.0), a + e * math.cos(i * 23.0))
        .map(_.toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def mse(df: org.apache.spark.sql.DataFrame, vecCol: String,
                  cb: org.apache.spark.sql.DataFrame, m: Int): Double = {
    val cbm = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val codes = PqIndex.encode(df, "vec_id", vecCol, cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val vecs = df.select(col("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val errs = vecs.map { case (id, v) =>
      val subDim = v.size / m
      codes(id).zipWithIndex.map { case (c, s) =>
        v.slice(s * subDim, (s + 1) * subDim).zip(cbm((s, c)))
          .map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    }
    errs.sum / errs.size
  }

  test("learned rotation is orthonormal") {
    val df = anisotropic()
    val (q, _) = OpqIndex.fit(df, "vec_id", "embedding", m = 4, k = 3,
      lloydIters = 2, opqIters = 3)
    val d = q.size
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => q(i)(t) * q(j)(t)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"Q·Qᵀ[$i][$j] = $dot")
    }
  }

  test("learned OPQ beats identity PQ and Hadamard PQ on anisotropic data") {
    val df = anisotropic()
    val m = 4; val k = 3

    val plainCb = PqIndex.fit(df, "vec_id", "embedding", m, k, iters = 3)
    val plainErr = mse(df, "embedding", plainCb, m)

    val had = PqIndex.rotate(df, "embedding", 8)
    val hadCb = PqIndex.fit(had, "vec_id", "embedding", m, k, iters = 3)
    val hadErr = mse(had, "embedding", hadCb, m)

    val (q, opqCb) = OpqIndex.fit(df, "vec_id", "embedding", m, k,
      lloydIters = 3, opqIters = 4)
    val rotated = OpqIndex.rotate(df, "embedding", q)
    val opqErr = mse(rotated, "embedding", opqCb, m)

    assert(opqErr <= plainErr * 1.0001,
      s"learned OPQ ($opqErr) must not lose to identity PQ ($plainErr)")
    assert(opqErr < hadErr,
      s"learned OPQ ($opqErr) should beat structured rotation ($hadErr)")
    assert(opqErr < plainErr * 0.75,
      s"on anisotropic data the win should be clear: $opqErr vs $plainErr")
  }

  test("fit is deterministic") {
    val df = anisotropic()
    def run() = OpqIndex.fit(df, "vec_id", "embedding", m = 4, k = 3,
      lloydIters = 2, opqIters = 2)
    val (q1, cb1) = run(); val (q2, cb2) = run()
    assert(q1 == q2)
    assert(cb1.orderBy("subspace", "code").collect().toSeq ==
      cb2.orderBy("subspace", "code").collect().toSeq)
  }

  test("end-to-end: rotated encode + ADC search finds true neighbors") {
    val df = anisotropic()
    val (q, cb) = OpqIndex.fit(df, "vec_id", "embedding", m = 4, k = 8,
      lloydIters = 3, opqIters = 3)
    val rotated = OpqIndex.rotate(df, "embedding", q)
    val enc = PqIndex.encode(rotated, "vec_id", "embedding", cb)
    val res = PqIndex.search(enc, rotated.filter(col("vec_id") === 0L),
      "vec_id", "embedding", cb, k = 5).orderBy("rank").collect()
    assert(res.length == 5)
    // rotation is orthonormal: true nearest neighbors are preserved;
    // with k=8 codewords per subspace the top hit should be a row whose
    // generator phase is adjacent (ids near 0 mod the sin/cos periods)
    assert(res.forall(_.getDouble(2) >= 0.0))
  }
}
