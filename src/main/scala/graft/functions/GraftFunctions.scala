package graft.functions

import org.apache.spark.sql.{Column, Encoders, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._

/** SQL-surface registration for graft's function library, so every
  * operator is reachable from `spark.sql(...)` as well as the Column
  * API (the reference's capabilities are library functions; a Spark
  * engine should expose them to SQL users too).
  */
object GraftFunctions {

  /** Register all graft functions on a session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "scala_udf")
    // compiled kernels on the SQL surface: the width/length argument
    // must be an int literal — the expression bakes it into generated
    // code. One extractor, shared by every (text, int) kernel, with
    // the Column API's own lower-bound require (the kernels would
    // silently widen k <= 0 and the two surfaces must agree).
    def intLit(name: String)(exprs: Seq[
        org.apache.spark.sql.catalyst.expressions.Expression]): Int = {
      if (exprs.length != 2) throw new IllegalArgumentException(
        s"$name(text, n) takes exactly 2 arguments, got ${exprs.length}")
      val n = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions
          .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$name(text, n): n must be an integer literal, got $other")
      }
      if (n < 1) throw new IllegalArgumentException(
        s"$name(text, n): n must be >= 1, got $n")
      n
    }
    registry.createOrReplaceTempFunction(
      "word_shingles", exprs =>
        WordShinglesExpr(exprs.head, intLit("word_shingles")(exprs)),
      "scala_udf")
    registry.createOrReplaceTempFunction(
      "word_shingle_hashes", exprs => WordShingleHashesExpr(
        exprs.head, intLit("word_shingle_hashes")(exprs)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "gram_hashes", exprs =>
        GramHashesExpr(exprs.head, intLit("gram_hashes")(exprs)),
      "scala_udf")
    registry.createOrReplaceTempFunction(
      "gram_rows", exprs =>
        GramRowsExpr(exprs.head, intLit("gram_rows")(exprs)),
      "scala_udf")
    registry.createOrReplaceTempFunction(
      "quality_stats", exprs => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"quality_stats(text) takes exactly 1 argument, " +
            s"got ${exprs.length}")
        QualityStatsExpr(exprs.head)
      }, "scala_udf")

    // column-composition functions registered as SQL macros via udfs
    // would lose codegen; instead expose them as temp functions built
    // from their expression trees
    spark.udf.register("graft_sanitize",
      (s: String) => if (s == null) null else NameUtil.sanitize(s))
    spark.udf.register("graft_to_snake",
      (s: String) => if (s == null) null else NameUtil.toSnake(s))
    spark.udf.register("graft_to_standard",
      (s: String) => if (s == null) null else NameUtil.toStandard(s))
    // typed Aggregator exposed to the DataFrame/SQL surface:
    // graft_top3(id, score) → array<struct<id,score>> (k=3 variant;
    // instantiate TopKAggregator directly for other k)
    spark.udf.register("graft_top3",
      F.udaf(new TopKAggregator(3), Encoders.product[Scored]))
  }

  // Column-API re-exports (one import site for users)
  def poly_hash(c: Column): Column = PolyHashFunctions.poly_hash(c)
  def cosine_similarity(a: Column, b: Column): Column =
    VectorFunctions.cosineSimilarity(a, b)
  def lang_id(c: Column): Column = TextFunctions.langId(c)
  def quality_score(c: Column): Column = TextFunctions.qualityScore(c)
  def token_count(c: Column): Column = TextFunctions.tokenCount(c)
  def char_ngrams(c: Column, n: Int): Column = TextFunctions.charNGrams(c, n)
  def word_shingles(c: Column, k: Int): Column =
    TextFunctions.wordShingles(c, k)
  def word_shingle_hashes(c: Column, k: Int): Column =
    WordShingles.shingleHashes(c, k)
  def gram_hashes(c: Column, length: Int): Column =
    GramHash.gramHashes(c, length)
  def gram_rows(c: Column, length: Int): Column =
    GramHash.gramRows(c, length)
  def quality_stats(c: Column): Column = QualityStats.qualityStats(c)
  def nature_voie_label(c: Column): Column =
    graft.sources.Fantoir.natureVoieLabel(c)
  def rolling_hash_mod(c: Column): Column =
    TextFunctions.rollingHashMod(c)
  def simhash(c: Column): Column = graft.operators.Dedup.simhash(c)
  def minhash_signature(shingles: Column, numHashes: Int): Column =
    graft.operators.Dedup.minhashSignature(shingles, numHashes)
  def vector_dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)
  def l2_distance(a: Column, b: Column): Column =
    VectorFunctions.l2Distance(a, b)
  def srp_bucket(v: Column, planes: Int): Column =
    VectorFunctions.srpBucket(v, planes)
}
