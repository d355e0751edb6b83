package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the s14 SemDeDup pipeline (ad-hoc scale
  * diagnostics, [[ScaleDiag]] family — not part of the driver
  * contract): fit / pairs / connected-components / survivors, with
  * per-round CC times. This is the harness that exposed the
  * label-propagation CC needing 17 rounds on the ~sf1 embedding graph
  * (chains with ids uncorrelated to graph position), motivating the
  * star-contraction rewrite in [[operators.Dedup.connectedComponents]].
  */
object SemDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"stage $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val emb = Tables.load(spark, dir, "embeddings")
    timed("load")(emb.count())
    val k = operators.IvfIndex.kFor(emb.count())
    println(s"  k=$k")
    val cents = timed("fit")(
      operators.IvfIndex.fit(emb, "vec_id", "embedding", k = k, iters = 3))
    val pairs = timed("pairs") {
      val p = operators.SemDeDup
        .pairs(emb, "vec_id", "embedding", cents, 0.4)
        .select(col("id_a"), col("id_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"  pairs=${p.count()}")
      p
    }
    val comps = timed("components") {
      val c = operators.Dedup.connectedComponents(pairs, maxIters = 30,
        onRound = (i, sec) => println(f"  round $i ${sec}%6.2f s"))
      println(s"  comp rows=${c.count()}")
      c
    }
    timed("survivors_join") {
      operators.SemDeDup
        .survivors(emb, "vec_id", "embedding", cents, 0.4).count()
    }
    spark.stop()
  }
}
