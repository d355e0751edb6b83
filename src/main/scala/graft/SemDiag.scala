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
    // Optional second arg `breakdown`: split the pair mass into the
    // scale-up family's cross-copy LEAKAGE (two transformed copies of
    // the SAME source vector: id_a ≡ id_b mod the source stride) vs
    // genuine source-level neighbors. The leakage term is quadratic in
    // copies BY CONSTRUCTION — C(k,2) copy pairs per source × the tail
    // of the cross-class cosine distribution above the SemDeDup τ (and
    // k > dim copies of a unit vector in R^dim CANNOT all stay below a
    // fixed τ: packing bounds make some tail mass unavoidable for any
    // orthogonal-transform family) — so an s14 scale read must quote
    // edge-mass growth separately from the plan's per-edge bytes.
    if (args.length > 1 && args(1) == "breakdown") {
      // Source stride = row count of the corpus this scale-up family was
      // minted from (vec_id = src + copy*stride). Passed as args(2) so a
      // corpus scaled from any base gets the right stride.
      val srcDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
      val srcMax = Tables.load(spark, srcDir, "embeddings")
        .agg(max(col("vec_id"))).head().getLong(0)
      val vecS = srcMax + 1
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      timed("breakdown") {
        // same_copy (i == j): the source pair's cosine is PRESERVED by
        // the shared orthogonal map — this mass is (source pairs ≥ τ)
        // × k, linear by construction. cross_copy (i ≠ j): two
        // DIFFERENT transforms — decorrelated cosines whose tail above
        // τ rides C(k,2) pair slots, the quadratic term (same_src
        // isolates the same-source-vector subset of it). Copy index is
        // floor(id / stride): Spark `/` on longs is DOUBLE division, so
        // the comparison must go through floor() to be integral.
        val tagged = pairs.select(
          (floor(col("id_a") / vecS) === floor(col("id_b") / vecS))
            .as("same_copy"),
          (col("id_a") % vecS === col("id_b") % vecS).as("same_src"))
        val agg = tagged.groupBy("same_copy", "same_src").count()
          .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) ->
            r.getLong(2)).toMap.withDefaultValue(0L)
        println(s"  within_copy=${agg((true, false))} " +
          s"cross_copy_diff_src=${agg((false, false))} " +
          s"cross_copy_same_src=${agg((false, true))} (vecS=$vecS dim=$dim)")
      }
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
