package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.b similarity-search extension).
  *
  * Scale shape: the query set is small and broadcast; the corpus streams
  * map-side. Brute force is the exact baseline (one pass, top-k via
  * per-query window). The SRP-LSH variant prunes the corpus to matching
  * hyperplane-sign buckets first — at 100 TB the bucket filter is the
  * difference between scanning everything per query and scanning
  * ~corpus/2^planes, at the cost of recall (probe multiple buckets or
  * lower `planes` to trade back).
  */
object Similarity {

  /** The SRP bucket-count knob, made automatic: plane count for a corpus
    * of `n` vectors so the EXPECTED bucket population stays ≈
    * `targetBucket` as the corpus grows (2^planes buckets absorb growth;
    * the within-bucket self-join stays O(n·targetBucket), and bucketed
    * top-k keeps a ≈constant per-query candidate set). `floor` pins the
    * caller's historical fixed setting so every ORACLE-SF result
    * (sf0.001/sf0.01, 500 vectors) stays byte-identical to the
    * fixed-planes era (6 for the near-dup pair path, 4 for the top-k
    * path); above the floor the knob engages wherever the growth law
    * says so — at sf0.1 (2000 vectors) the floor-4 path already scales
    * to 6 planes by design. Measured on the ~sf1 corpus (20k
    * vectors): planes 6→9 cut the near-dup pair query 1.11→0.59 s —
    * each extra plane is one more codegen'd dot per row against a
    * halved candidate set.
    */
  def planesFor(n: Long, targetBucket: Int = 32, floor: Int = 6): Int =
    math.max(floor, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0))
      .toInt)

  /** cosine = dot/(‖a‖·‖b‖) with norms already materialized per vector. */
  private def cosineFromNorms(a: org.apache.spark.sql.Column,
                              b: org.apache.spark.sql.Column,
                              na: org.apache.spark.sql.Column,
                              nb: org.apache.spark.sql.Column) = {
    val d = na * nb
    when(d === 0.0, lit(0.0)).otherwise(VectorFunctions.dot(a, b) / d)
  }

  /** Exact top-k cosine neighbors for each query vector.
    * `corpus`: (idCol, vecCol); `queries`: (idCol, vecCol), small.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms are computed once per vector, not once per pair: cosine per
    // pair is then a single dot + one multiply/divide (bit-identical to
    // recomputing — sqrt(na)·sqrt(nb) either way).
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec"),
      VectorFunctions.norm(col(vecCol)).as("query_norm")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("vec"), VectorFunctions.norm(col(vecCol)).as("nrm"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineFromNorms(col("query_vec"), col("vec"),
        col("query_norm"), col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: only corpus vectors in the same
    * sign-random-projection bucket as the query are scored.
    *
    * `probeRadius = 1` enables MULTI-PROBE (Lv et al., "Multi-Probe
    * LSH", VLDB 2007, adapted to SRP): the query also probes the
    * `planes` buckets one sign-flip away — the buckets a near-neighbor
    * most likely landed in when one hyperplane split the pair. The r15
    * sf10 recall read (`bench/recall_r15_sf10.json`) is the
    * motivation: [[planesFor]] holds the per-bucket population (and so
    * per-query COST) ≈constant as the corpus grows, but single-bucket
    * recall decays with plane count (each extra plane is another
    * chance to split a true pair — 0.056 at 13 planes vs the 0.15
    * gate-SF floor at 4). Radius 1 scores (1+planes)·targetBucket
    * candidates — still a bounded per-query set that RIDES the knob —
    * and restores the recall the plane growth spent. Default 0 keeps
    * every existing result byte-identical.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 8, probeRadius: Int = 0): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1,
      s"probeRadius=$probeRadius: 0 (single bucket) or 1 (multi-probe)")
    val bucketed = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("vec"), VectorFunctions.norm(col(vecCol)).as("nrm"),
      VectorFunctions.srpBucket(col(vecCol), planes).as("bucket"))
    val bucket0 = VectorFunctions.srpBucket(col(vecCol), planes)
    // radius 0 keeps the exact no-Generate plan shape (a 1-element
    // explode would read as a generated frame to BroadcastGateSpec's
    // sweep and carry Generate's garbage size estimates for nothing);
    // radius 1 explodes the probe list on the already-broadcast side
    val bucketCol =
      if (probeRadius == 0) bucket0
      else explode(array(bucket0 +: (0 until planes).map(i =>
        bucket0.bitwiseXOR(lit(1L << i))): _*))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec"),
      VectorFunctions.norm(col(vecCol)).as("query_norm"),
      bucketCol.as("bucket")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    bucketed.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineFromNorms(col("query_vec"), col("vec"),
        col("query_norm"), col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** QUERY-DIRECTED multi-probe top-k (Lv et al., "Multi-Probe LSH",
    * VLDB 2007, §4.2's perturbation ordering adapted to SRP sign
    * flips): each query probes its home bucket plus the
    * `probeBuckets − 1` cheapest sign-flip perturbations, where a
    * perturbation's cost is the summed |projection| MARGIN of the
    * flipped planes — the planes the query sits closest to are the
    * ones a true neighbor most plausibly landed across, so those
    * buckets are probed first. Perturbations range over radius ≤ 2
    * (single flips and pairs), which at a fixed candidate budget is
    * where query-directed ordering beats blind radius expansion: the
    * blind radius-1 set spends its budget equally on all planes, most
    * of which have wide margins and near-zero flip probability.
    *
    * Measured at sf10 (200k vectors, planes = planesFor = 13,
    * `bench/recall_r16_sf10.json`): at the SAME 14-bucket budget as
    * blind radius 1, directed reads 0.230 vs 0.176 — the ordering
    * itself buys recall at zero extra cost — and the budget ladder
    * reads 0.230 / 0.278 / 0.322 at 14 / 27 / 53 buckets, clearing
    * the 0.3 serving floor at [[probeBudgetFor]] = 4·planes + 1
    * (~1.7k candidates of 200k, 0.85%). Still a shortlist tier —
    * PQ-refine reads 0.956 at comparable cost and stays the serving
    * default (`searchRefined`).
    *
    * Scale shape, unchanged from [[lshTopK]]: queries (with their
    * per-plane projections — ONE evaluation derives bucket and
    * margins) broadcast with their probe list exploded; the corpus is
    * bucketed once, map-side; per-query candidates stay bounded by
    * probeBuckets · expected bucket population, riding [[planesFor]].
    * Probe buckets are DISTINCT by construction (distinct flip
    * masks), so no pair dedup is needed before the rank window.
    */
  /** The probe budget that held recall@5 ≥ 0.3 on the sf10 read —
    * rides the plane count, which itself rides the corpus through
    * [[planesFor]], so the candidate volume stays
    * ≈ (4·planes + 1)·targetBucket as the corpus grows. Clamped to
    * the radius-2 perturbation universe at small plane counts (at
    * planes = 4 there ARE only 11 buckets within two flips).
    */
  def probeBudgetFor(planes: Int): Int =
    math.min(4 * planes + 1, 1 + planes + planes * (planes - 1) / 2)

  /** @param maxRadius perturbation universe: 2 (default — single
    *   flips and pairs, the r16 shape, results byte-identical) or 3,
    *   which adds exactly ONE radius-3 perturbation: the triple of the
    *   query's three NARROWEST margins (VERDICT r16 stretch #8's
    *   literal question). The full C(n,3) triple universe was measured
    *   and REJECTED: the summed-margin cost treats a 3-flip bucket
    *   like any pair, but per-bucket hit probability decays with flip
    *   count faster than the linear cost captures, so admitted triples
    *   displaced productive pairs wholesale (recall 0.400 → 0.280 at
    *   the same budget on the gate corpus). The one cheapest triple
    *   bounds the displacement to a single bucket.
    */
  def lshTopKDirected(corpus: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      planes: Int, probeBuckets: Int,
                      maxRadius: Int = 2): DataFrame = {
    require(maxRadius == 2 || maxRadius == 3,
      s"maxRadius=$maxRadius: 2 (singles+pairs) or 3 (+the narrowest " +
        "triple)")
    require(maxRadius == 2 || planes >= 3,
      s"maxRadius=3 needs planes >= 3, got $planes")
    val maxProbes = 1 + planes + planes * (planes - 1) / 2 +
      (if (maxRadius == 3) 1 else 0)
    require(probeBuckets >= 1 && probeBuckets <= maxProbes,
      s"probeBuckets=$probeBuckets outside [1, $maxProbes] " +
        s"(radius <= $maxRadius perturbations of $planes planes)")
    val bucketed = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("vec"), VectorFunctions.norm(col(vecCol)).as("nrm"),
      VectorFunctions.srpBucket(col(vecCol), planes).as("bucket"))
    val withProj = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec"),
      VectorFunctions.norm(col(vecCol)).as("query_norm"),
      VectorFunctions.srpProjections(col(vecCol), planes).as("_pj"))
    def margin(i: Int) = abs(element_at(col("_pj"), i + 1))
    val home = (0 until planes).map(p =>
        when(element_at(col("_pj"), p + 1) >= 0, lit(1L << p))
          .otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    // candidate perturbations: all single flips and all pairs, as
    // (cost, flip-mask) structs; array_sort orders by cost (mask
    // tie-breaks — deterministic), slice takes the cheapest
    val singles = (0 until planes).map(i =>
      struct(margin(i).as("c"), lit(1L << i).as("m")))
    val pairs = for {
      i <- 0 until planes; j <- (i + 1) until planes
    } yield struct((margin(i) + margin(j)).as("c"),
      lit((1L << i) | (1L << j)).as("m"))
    val triples =
      if (maxRadius < 3) Seq.empty
      else {
        // the ONE triple of the query's three narrowest margins:
        // sort the single-flip structs by margin, fold the cheapest
        // three into a (summed cost, OR'd mask) struct
        val top3 = slice(array_sort(array(singles: _*)), lit(1), lit(3))
        Seq(struct(
          aggregate(top3, lit(0.0d),
            (acc, x) => acc + x.getField("c")).as("c"),
          aggregate(top3, lit(0L),
            (acc, x) => acc.bitwiseOR(x.getField("m"))).as("m")))
      }
    val flips = slice(
      array_sort(array((singles ++ pairs ++ triples): _*)),
      lit(1), lit(probeBuckets - 1))
    val q = broadcast(withProj
      .withColumn("_home", home)
      .withColumn("bucket", explode(concat(
        array(col("_home")),
        transform(flips, f => col("_home").bitwiseXOR(f.getField("m"))))))
      .select(col("query_id"), col("query_vec"), col("query_norm"),
        col("bucket")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    bucketed.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineFromNorms(col("query_vec"), col("vec"),
        col("query_norm"), col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank"))
  }

  /** EXACT cosine pairs above a threshold — the oracle-checkable
    * counterpart of [[nearDupPairs]] (no LSH pruning, so O(n²) in the
    * candidate set: callers pre-filter/sample; at corpus scale use
    * [[nearDupPairs]] instead).
    */
  def exactCosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      VectorFunctions.norm(col(vecCol)).as("nrm"))
    val a = base.select(col("id").as("id_a"), col("vec").as("vec_a"),
      col("nrm").as("nrm_a"))
    val b = base.select(col("id").as("id_b"), col("vec").as("vec_b"),
      col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosineFromNorms(col("vec_a"), col("vec_b"),
        col("nrm_a"), col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Embedding near-duplicate pairs above a cosine threshold, LSH-pruned
    * (same-bucket pairs only scored) — the embedding-cosine dedup path.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, planes: Int = 6): DataFrame = {
    // session-cached, not per-call persisted: the bucketed frame feeds
    // both sides of the self-join (ReuseExchange can't unify the aliased
    // subplans), and a per-call persist leaks one pinned frame per
    // invocation (VERDICT r3 "What's wrong #1").
    val bucketed = graft.FrameCache.forInput(corpus,
      s"srpbuckets:$idCol:$vecCol:$planes")(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
        VectorFunctions.norm(col(vecCol)).as("nrm"),
        VectorFunctions.srpBucket(col(vecCol), planes).as("bucket")))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosineFromNorms(col("vec_a"), col("vec_b"),
        col("nrm_a"), col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
