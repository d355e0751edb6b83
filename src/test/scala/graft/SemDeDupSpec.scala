package graft

import graft.operators.{IvfIndex, SemDeDup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup's approximation contract, proven on the sf0.001 embeddings:
  * within a cluster the pairs are EXACT (identical to the O(n²)
  * threshold join restricted to co-clustered ids), the survivor rule is
  * the deterministic min-id-per-component convention shared with the
  * text dedup path, and the only loss vs the exact all-pairs graph is
  * cross-cluster pairs — measured here as recall, with a floor pinned
  * as a regression tripwire (not a quality claim; the paper's recall
  * rises with cluster overlap in real, clusterable corpora).
  */
class SemDeDupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val tau = 0.4

  private lazy val emb: DataFrame =
    Tables.load(spark, dir, "embeddings")

  private lazy val centroids: DataFrame =
    IvfIndex.fit(emb, "vec_id", "embedding", k = 8, iters = 3)

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val semPairs: Set[(Long, Long)] =
    pairSet(SemDeDup.pairs(emb, "vec_id", "embedding", centroids, tau))

  private lazy val exactPairs: Set[(Long, Long)] =
    pairSet(Similarity.exactCosinePairs(emb, "vec_id", "embedding", tau))

  test("within-cluster pairs equal the exact join restricted to co-clustered ids") {
    val cell = IvfIndex.assign(emb, "vec_id", "embedding", centroids)
      .select(col("id").as("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = exactPairs.filter { case (a, b) => cell(a) == cell(b) }
    assert(semPairs === expected)
  }

  test("semdedup is a subset of the exact threshold graph (no false pairs)") {
    assert(semPairs.subsetOf(exactPairs))
  }

  test("recall vs the exact all-pairs graph clears the pinned floor") {
    assume(exactPairs.nonEmpty)
    val recall = semPairs.size.toDouble / exactPairs.size
    info(f"semdedup recall@tau=$tau%.1f = $recall%.2f " +
      s"(${semPairs.size}/${exactPairs.size} pairs)")
    assert(recall >= 0.25)
  }

  test("survivors: min id per component survives, singletons survive") {
    val out = SemDeDup.survivors(emb, "vec_id", "embedding", centroids, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === emb.count())
    val byComponent = out.groupBy(_._2)
    byComponent.foreach { case (comp, members) =>
      // exactly one survivor per component: the smallest id, which also
      // labels the component
      val survivors = members.filter(_._3).map(_._1)
      assert(survivors === Array(members.map(_._1).min))
      assert(survivors.head === comp)
    }
    // every id paired to a smaller id via the threshold graph is dropped
    val dropped = out.filter(!_._3).map(_._1).toSet
    val inPairs = semPairs.flatMap(p => Seq(p._1, p._2))
    assert(dropped.subsetOf(inPairs))
  }
}
