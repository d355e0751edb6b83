package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated clusters of 10 vectors each
  private def clustered = (0L until 30L).map { i =>
    val center = (i % 3).toInt
    val bases = Seq(
      Array(10.0f, 0.0f, 0.0f), Array(0.0f, 10.0f, 0.0f),
      Array(0.0f, 0.0f, 10.0f))
    val base = bases(center)
    val jitter = Array.tabulate(3)(d =>
      (math.sin(i * 13 + d * 7) * 0.5).toFloat)
    (i, base.zip(jitter).map { case (b, j) => b + j })
  }.toDF("vec_id", "embedding")

  test("fit finds the clusters; centroids are deterministic") {
    val c1 = IvfIndex.fit(clustered, "vec_id", "embedding", k = 3, iters = 4)
      .orderBy("centroid_id").collect()
    val c2 = IvfIndex.fit(clustered, "vec_id", "embedding", k = 3, iters = 4)
      .orderBy("centroid_id").collect()
    assert(c1.map(_.getSeq[Double](1)).toSeq ==
      c2.map(_.getSeq[Double](1)).toSeq)
    // each centroid should be dominated by a distinct axis
    val domAxes = c1.map(_.getSeq[Double](1).zipWithIndex.maxBy(_._1)._2)
      .toSet
    assert(domAxes == Set(0, 1, 2))
  }

  test("assign puts same-cluster vectors in the same list") {
    val centroids = IvfIndex.fit(clustered, "vec_id", "embedding", 3, 4)
    val lists = IvfIndex.assign(clustered, "vec_id", "embedding", centroids)
      .select(col("id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (i <- 0L until 30L)
      assert(lists(i) == lists(i % 3), s"vector $i in wrong list")
  }

  test("fit tolerates null and ragged vectors (skip / zero-pad)") {
    val messy = clustered.union(
      Seq((100L, null.asInstanceOf[Array[Float]]),
        (101L, Array(10.0f, 0.1f))) // short vector: missing dims = 0
        .toDF("vec_id", "embedding"))
    val c = IvfIndex.fit(messy, "vec_id", "embedding", k = 3, iters = 2)
      .collect()
    assert(c.length == 3) // trained, didn't throw
    val cb = graft.operators.PqIndex.fit(messy, "vec_id", "embedding",
      m = 3, k = 2, iters = 2).collect()
    assert(cb.length == 3 * 2)
  }

  test("search with nProbe=1 matches brute force on clustered data") {
    val centroids = IvfIndex.fit(clustered, "vec_id", "embedding", 3, 4)
    val queries = clustered.filter(col("vec_id") < 3)
    val ivf = IvfIndex.search(clustered, queries, "vec_id", "embedding",
      centroids, k = 3, nProbe = 1)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(clustered, queries,
      "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == brute) // within-cluster neighbors: IVF@1 probe is exact
  }

  test("listStats: populations sum to corpus, shares to 1, dead lists " +
    "surface with count 0") {
    val centroids = IvfIndex.fit(clustered, "vec_id", "embedding", 3, 4)
    val stats = IvfIndex.listStats(clustered, "vec_id", "embedding",
      centroids).orderBy("centroid_id").collect()
    assert(stats.length == 3)
    assert(stats.map(_.getLong(1)).sum == 30L)
    assert(math.abs(stats.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    // balanced clusters: imbalance == 1 for every list
    assert(stats.forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-12))

    // duplicate seed vectors kill a list at seed time: ids 0 and 1
    // identical → centroid 2 (the duplicate) attracts nothing
    val dup = Seq((0L, Array(10.0f, 0f, 0f)), (1L, Array(10.0f, 0f, 0f)),
      (2L, Array(0f, 10.0f, 0f))) ++ (3L until 20L).map(i =>
      (i, Array((i % 2) * 10.0f, ((i + 1) % 2) * 10.0f, 0f)))
    val dupDf = dup.toDF("vec_id", "embedding")
    val dead = IvfIndex.fit(dupDf, "vec_id", "embedding", k = 3, iters = 3)
    val deadStats = IvfIndex.listStats(dupDf, "vec_id", "embedding", dead)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(deadStats.values.exists(_ == 0L), deadStats.toString)
  }

  test("reseedEmpty repairs dead lists deterministically") {
    val dup = Seq((0L, Array(10.0f, 0f, 0f)), (1L, Array(10.0f, 0f, 0f)),
      (2L, Array(0f, 10.0f, 0f))) ++ (3L until 20L).map(i =>
      (i, Array((i % 3) * 10.0f, ((i + 1) % 3) * 10.0f,
        ((i + 2) % 3) * 10.0f)))
    val dupDf = dup.toDF("vec_id", "embedding")
    val fixed = IvfIndex.fit(dupDf, "vec_id", "embedding", k = 3,
      iters = 3, reseedEmpty = true)
    val stats = IvfIndex.listStats(dupDf, "vec_id", "embedding", fixed)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stats.values.forall(_ > 0L), stats.toString)
    // determinism: same inputs, same repaired centroids
    val again = IvfIndex.fit(dupDf, "vec_id", "embedding", k = 3,
      iters = 3, reseedEmpty = true)
    assert(fixed.orderBy("centroid_id").collect()
      .map(_.getSeq[Double](1)).toSeq ==
      again.orderBy("centroid_id").collect()
        .map(_.getSeq[Double](1)).toSeq)
  }
}
