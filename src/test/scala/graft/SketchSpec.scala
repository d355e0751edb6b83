package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Mergeability of the Datasketches HLL surface — the property that
  * makes distinct-counting work at 100 TB: sketch each shard, union the
  * small sketch states, never re-touch the data. d10's
  * approx_count_distinct is the one-shot form; this pins the two-level
  * rollup form a warehouse actually materializes (per-source sketches
  * kept as columns, merged on demand).
  */
class SketchSpec extends SparkSpec {

  test("per-source HLL sketches union to the global estimate") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(col("source"),
      explode(TextFunctions.wordShingles(col("text"), 2)).as("sh"))
      .localCheckpoint(true) // three readers below

    val exact = toks.select("sh").distinct().count()

    // two-level: sketch per source, merge the 20 sketch states
    val merged = toks.groupBy("source")
      .agg(hll_sketch_agg(col("sh")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)

    // one-level: sketch the whole column in one pass
    val single = toks
      .agg(hll_sketch_estimate(hll_sketch_agg(col("sh"))).as("est"))
      .head().getLong(0)

    val relErr = math.abs(merged - exact).toDouble / exact
    assert(relErr < 0.05,
      s"merged estimate $merged vs exact $exact (relErr $relErr)")
    // the merge must not degrade the estimate vs one-shot sketching
    val mergePenalty = math.abs(merged - single).toDouble / exact
    assert(mergePenalty < 0.02,
      s"two-level $merged vs one-level $single drifted by $mergePenalty")
  }
}
