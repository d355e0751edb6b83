package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the corpus embeddings with a coarse
  * k-means, compute pairwise cosine similarity ONLY within each
  * cluster, and keep one representative per group of semantic
  * near-duplicates.
  *
  * This is the embedding-space sibling of the MinHash+LSH text path
  * ([[Dedup.minhashLshPairs]]): LSH buckets by signature bands,
  * SemDeDup buckets by nearest centroid. Both turn an all-pairs
  * O(n²) into Σ_c O(n_c²) — the scale knob is k, chosen so the
  * expected cluster size n/k stays bounded as the corpus grows (the
  * paper runs k ≈ 11k on 100M+ docs; at 100 TB you raise k, not the
  * per-cluster work). The clustering reuses [[IvfIndex.fit]] — a
  * sample-trained, deterministic, RNG-free Lloyd quantizer whose
  * centroids enter the plan as literals, so assignment is a map-side
  * projection and the ONLY shuffle of corpus vectors is the
  * centroid_id-keyed exchange feeding the within-cluster join.
  *
  * Approximation contract (same as the paper's): pairs whose members
  * land in DIFFERENT clusters are never scored — recall vs the exact
  * all-pairs threshold graph is measured, not 1.0 ([[SemDeDupSpec]]
  * pins within-cluster exactness and measures global recall).
  */
object SemDeDup {

  /** Within-cluster cosine pairs at or above `tau`.
    * Output: (centroid_id, id_a, id_b, cosine) with id_a < id_b.
    */
  def pairs(corpus: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, tau: Double): DataFrame = {
    // norms ride the assignment projection — computed once per vector,
    // not once per pair; the self-join keys on centroid_id so a pair
    // is scored iff both sides share a cluster.
    val base = IvfIndex.assign(corpus, idCol, vecCol, centroids)
      .withColumn("nrm", VectorFunctions.norm(col("v")))
    val a = base.select(col("centroid_id"), col("id").as("id_a"),
      col("v").as("vec_a"), col("nrm").as("nrm_a"))
    val b = base.select(col("centroid_id"), col("id").as("id_b"),
      col("v").as("vec_b"), col("nrm").as("nrm_b"))
    val denom = col("nrm_a") * col("nrm_b")
    a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        when(denom === 0.0, lit(0.0))
          .otherwise(VectorFunctions.dot(col("vec_a"), col("vec_b")) / denom))
      .filter(col("cosine") >= tau)
      .select(col("centroid_id"), col("id_a"), col("id_b"), col("cosine"))
  }

  /** Semantic-dedup survivors: near-dup groups are the connected
    * components of the within-cluster threshold graph; the smallest id
    * per component survives (deterministic representative, matching
    * the text-dedup convention of [[Dedup.nearDupSurvivors]]).
    * Output: (id, component, is_survivor).
    */
  def survivors(corpus: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, tau: Double): DataFrame =
    Dedup.nearDupSurvivors(corpus, idCol,
      pairs(corpus, idCol, vecCol, centroids, tau)
        .select(col("id_a"), col("id_b")))
}
