package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed ANN index production vector stores run at
  * billion-vector scale — IVF's coarse quantizer prunes the corpus to
  * each query's `nProbe` inverted lists, and within those lists
  * distances come from PQ codes via the ADC table (no raw vectors
  * touched at query time).
  *
  * Cost shape per query: IVF alone scans corpus·nProbe/k_coarse raw
  * vectors; PQ alone scans every code; IVF-PQ scans
  * corpus·nProbe/k_coarse CODES — both pruning and compression. The
  * whole query side (probe selection + ADC table) is broadcast; the only
  * shuffle is the final (query_id, id) partial-sum aggregation.
  */
object IvfPq {

  /** Build both index parts once (coarse centroids + PQ codebooks). */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
          kCoarse: Int, m: Int, kCodes: Int, iters: Int = 3)
      : (DataFrame, DataFrame) =
    (IvfIndex.fit(corpus, idCol, vecCol, kCoarse, iters),
      PqIndex.fit(corpus, idCol, vecCol, m, kCodes, iters))

  /** Corpus prepared for serving: (id, centroid_id, codes). */
  def index(corpus: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, codebook: DataFrame): DataFrame =
    PqIndex.encode(corpus, idCol, vecCol, codebook)
      .join(IvfIndex.assign(corpus, idCol, vecCol, centroids)
        .select(col("id"), col("centroid_id")), Seq("id"))

  /** Top-k via coarse pruning + ADC. `indexed` is [[index]]'s output.
    * The scoring tail (table join, per-candidate sum, top-k tie-break)
    * is [[PqIndex.adcTopK]], shared with plain PQ search.
    */
  def search(indexed: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, centroids: DataFrame, codebook: DataFrame,
             k: Int, nProbe: Int = 2): DataFrame = {
    val probes = IvfIndex.probes(queries, idCol, vecCol, centroids, nProbe)
      .select(col("query_id"), col("centroid_id"))
    val table = PqIndex.adcTable(queries, idCol, vecCol, codebook)
    val triples = indexed.select(col("id"), col("centroid_id"),
      posexplode(col("codes")).as(Seq("subspace", "code")))
    PqIndex.adcTopK(
      triples.join(broadcast(probes), Seq("centroid_id"))
        .select(col("query_id"), col("id"), col("subspace"), col("code")),
      table, k)
  }
}
