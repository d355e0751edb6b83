package graft

import graft.operators.{PqIndex, Similarity}
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated clusters in 8-dim space, 4 vectors each
  private def clustered() = {
    val centers = Seq(
      Array.fill(8)(10.0f),
      Array.fill(8)(-10.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 10.0f else -10.0f))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 4
    } yield ((ci * 4 + j).toLong,
      c.zipWithIndex.map { case (x, i) => x + 0.1f * j * (1 + i % 3) })
    rows.toDF("vec_id", "embedding")
  }

  test("fit is deterministic and produces m×k codewords at most") {
    val df = clustered()
    val cb1 = PqIndex.fit(df, "vec_id", "embedding", m = 4, k = 3, iters = 2)
      .orderBy("subspace", "code").collect().toSeq
    val cb2 = PqIndex.fit(df, "vec_id", "embedding", m = 4, k = 3, iters = 2)
      .orderBy("subspace", "code").collect().toSeq
    assert(cb1 == cb2)
    assert(cb1.size == 4 * 3)
    assert(cb1.forall(_.getSeq[Double](2).size == 2)) // 8 dims / 4 subspaces
  }

  test("encode emits one small code per subspace, same cluster same codes") {
    val df = clustered()
    val cb = PqIndex.fit(df, "vec_id", "embedding", m = 4, k = 3, iters = 3)
    val codes = PqIndex.encode(df, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == 12)
    assert(codes.values.forall(_.size == 4))
    // vectors from the same tight cluster quantize identically
    assert(codes(0L) == codes(1L) || codes(1L) == codes(2L))
  }

  test("ADC search finds same-cluster neighbors first") {
    val df = clustered()
    val cb = PqIndex.fit(df, "vec_id", "embedding", m = 4, k = 3, iters = 3)
    val enc = PqIndex.encode(df, "vec_id", "embedding", cb)
    val res = PqIndex.search(enc, df.filter(col("vec_id") === 0L),
      "vec_id", "embedding", cb, k = 3)
      .orderBy("rank").collect()
    assert(res.length == 3)
    // cluster 0 is ids 0-3: all top-3 neighbors of id 0 come from it
    assert(res.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 3L))
  }

  test("PQ approx distance tracks true distance ordering across clusters") {
    val df = clustered()
    val cb = PqIndex.fit(df, "vec_id", "embedding", m = 4, k = 3, iters = 3)
    val enc = PqIndex.encode(df, "vec_id", "embedding", cb)
    val pq = PqIndex.search(enc, df.filter(col("vec_id") === 0L),
      "vec_id", "embedding", cb, k = 11).orderBy("rank")
      .select("neighbor_id").as[Long].collect().toSeq
    val exact = Similarity.bruteForceTopK(df,
      df.filter(col("vec_id") === 0L), "vec_id", "embedding", k = 11)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    // same top-3 set (same-cluster ids) even if within-cluster order differs
    assert(pq.take(3).toSet == exact.take(3).toSet)
  }

  test("Hadamard rotation is orthonormal: norms and distances preserved") {
    val df = clustered()
    import graft.functions.VectorFunctions
    val rows = df.select(
      VectorFunctions.norm(col("embedding")).as("n0"),
      VectorFunctions.norm(
        VectorFunctions.rotateHadamard(col("embedding"), 8)).as("n1"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1))
      < 1e-9, s"${r.getDouble(0)} vs ${r.getDouble(1)}"))
  }

  test("rotated PQ (OPQ-lite) search matches plain PQ recall on clusters") {
    val df = clustered()
    val rotated = graft.operators.PqIndex.rotate(df, "embedding", 8)
    val cb = PqIndex.fit(rotated, "vec_id", "embedding", m = 4, k = 3,
      iters = 3)
    val enc = PqIndex.encode(rotated, "vec_id", "embedding", cb)
    val res = PqIndex.search(enc,
      rotated.filter(col("vec_id") === 0L), "vec_id", "embedding", cb,
      k = 3).orderBy("rank").collect()
    assert(res.length == 3)
    assert(res.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 3L))
  }

  test("map-side encode runs on an unbounded stream (index maintenance)") {
    implicit val sqlCtx = spark.sqlContext
    val df = clustered()
    val cb = PqIndex.fit(df, "vec_id", "embedding", m = 4, k = 3, iters = 3)
    val batchCodes = PqIndex.encode(df, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    val query = PqIndex.encode(stream, "vec_id", "embedding", cb)
      .writeStream.format("memory").queryName("pq_stream_encode")
      .outputMode("append").start()
    try {
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      input.addData(rows.toSeq)
      query.processAllAvailable()
      val streamed = spark.table("pq_stream_encode")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(streamed == batchCodes) // identical codes, batch vs stream
    } finally query.stop()
  }

  test("IVF-PQ prunes to probed lists and still finds the home cluster") {
    // ids interleaved across clusters (id % 3 = cluster) so the
    // smallest-id seeds land in three DIFFERENT clusters — the sampling
    // discipline a real pipeline uses when seeding a coarse quantizer
    val centers = Seq(
      Array.fill(8)(10.0f),
      Array.fill(8)(-10.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 10.0f else -10.0f))
    val rows = for {
      j <- 0 until 4
      (c, ci) <- centers.zipWithIndex
    } yield ((j * 3 + ci).toLong,
      c.zipWithIndex.map { case (x, i) => x + 0.1f * j * (1 + i % 3) })
    val df = rows.toDF("vec_id", "embedding")

    val (centroids, cb) = graft.operators.IvfPq.fit(
      df, "vec_id", "embedding", kCoarse = 3, m = 4, kCodes = 3)
    val indexed = graft.operators.IvfPq.index(
      df, "vec_id", "embedding", centroids, cb)
    val res = graft.operators.IvfPq.search(indexed,
      df.filter(col("vec_id") === 0L), "vec_id", "embedding",
      centroids, cb, k = 3, nProbe = 1)
      .orderBy("rank").collect()
    assert(res.length == 3)
    // cluster 0 is ids ≡ 0 (mod 3): 3, 6, 9
    assert(res.map(_.getLong(1)).toSet == Set(3L, 6L, 9L))
  }
}
