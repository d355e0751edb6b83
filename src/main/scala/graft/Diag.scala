package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale diagnostics (not part of the driver contract). */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.load(spark, dir, "embeddings")
    emb.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    time("ivf fit cold") {
      graft.operators.IvfIndex.fit(
        emb, "vec_id", "embedding", k = 8, iters = 3).count()
    }
    for (it <- Seq(0, 1, 3)) time(s"ivf fit warm ($it iters)") {
      graft.operators.IvfIndex.fit(
        emb, "vec_id", "embedding", k = 8, iters = it).count()
    }
    val centroids = time("ivf fit") {
      val c = graft.operators.IvfIndex.fit(
        emb, "vec_id", "embedding", k = 8, iters = 3)
      c.count(); c
    }
    val codebook = time("pq fit") {
      val c = graft.operators.PqIndex.fit(
        emb, "vec_id", "embedding", m = 8, k = 16, iters = 3)
      c.count(); c
    }
    val indexed = time("ivfpq index") {
      val i = graft.operators.IvfPq.index(
        emb, "vec_id", "embedding", centroids, codebook)
      i.count(); i
    }
    time("ivfpq search 1st") {
      graft.operators.IvfPq.search(indexed,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        centroids, codebook, k = 5, nProbe = 2).count()
    }
    time("ivfpq search 2nd") {
      graft.operators.IvfPq.search(indexed,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        centroids, codebook, k = 5, nProbe = 2).count()
    }
    spark.stop()
  }
}
