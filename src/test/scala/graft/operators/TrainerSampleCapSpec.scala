package graft.operators

import org.apache.spark.sql.functions._

/** The trainer-sample cap contract (VERDICT r7 Next #7): `collectSample`
  * is the one driver-side collect whose size is a parameter, so the
  * ceiling is load-bearing — it is what makes "the full corpus never
  * reaches the driver" a mechanical property rather than a convention.
  */
class TrainerSampleCapSpec extends graft.SparkSpec {

  test("collectSample refuses caps above MaxCap and non-positive caps") {
    assert(Sampling.MaxCap == 65536)
    val df = spark.range(4).select(col("id"),
      array(lit(1.0f), lit(2.0f)).as("emb"))
    intercept[IllegalArgumentException] {
      Sampling.collectSample(df, "id", "emb", Sampling.MaxCap + 1,
        byHash = false)
    }
    intercept[IllegalArgumentException] {
      Sampling.collectSample(df, "id", "emb", 0, byHash = false)
    }
  }

  test("a cap at the ceiling collects at most cap rows, deterministically") {
    val df = spark.range(10).select(col("id"),
      array(col("id").cast("float"), lit(0.0f)).as("emb"))
    val s = Sampling.collectSample(df, "id", "emb", Sampling.MaxCap,
      byHash = false)
    assert(s.length == 10) // corpus smaller than cap: everything, once
    val capped = Sampling.collectSample(df, "id", "emb", 3, byHash = false)
    assert(capped.length == 3)
    assert(capped.map(_.head).toSeq == Seq(0.0, 1.0, 2.0)) // id order
  }
}
