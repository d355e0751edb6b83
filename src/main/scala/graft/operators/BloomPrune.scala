package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the shuffle-volume lever for fact⋈dim
  * joins where the dim side is too big to broadcast AS A HASH RELATION
  * but its KEY SET fits a bloom filter (~10 bits/key at 1% fpp: 100M
  * keys ≈ 120 MB vs gigabytes of rows). The fact side is pre-filtered
  * map-side BEFORE its shuffle, so shuffle volume drops to roughly the
  * join selectivity; the exact join still runs after, and because a
  * bloom filter has NO FALSE NEGATIVES the composed result is
  * semantically identical — false positives only cost shuffle rows.
  *
  * This is the same mechanism as Spark's AQE runtime filter injection
  * (`InjectRuntimeFilter`), exposed as an explicit operator for the
  * cases the optimizer's heuristics skip: pruning against a PRE-BUILT
  * key set reused across many queries (e.g. "documents that survived
  * dedup" applied to every downstream table), or pruning a streaming
  * fact source where no runtime subquery can run.
  *
  * Mechanics: the filter is BUILT distributed (partial-aggregated
  * `BloomFilterAggregate` over xxhash64 of the keys — one pass, no
  * shuffle of values); only the finished bitmap comes to the driver and
  * is inlined as a binary literal into `might_contain` — exactly the
  * shape the optimizer's own injected filters take after their scalar
  * subquery executes. Both expressions are Spark-internal Catalyst
  * operators with codegen, so the probe stays in whole-stage codegen.
  */
object BloomPrune {

  /** Optimal bit count for n keys at the given false-positive rate. */
  private def numBits(expectedKeys: Long, fpp: Double): Long =
    math.max(64L, (-expectedKeys * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong)

  /** Build a bloom filter of `dim`'s key column (distributed one-pass
    * aggregation; returns the serialized bitmap — kilobytes to
    * megabytes depending on `expectedKeys`).
    *
    * xxhash64 is TYPE-sensitive: the same number hashed as int vs
    * bigint produces different bits, so a build/probe pair over
    * mixed-width key columns would false-NEGATIVE every match. Both
    * [[build]] and [[mightContain]] therefore hash through
    * [[canonicalKey]]; always probe with the same canonicalization the
    * filter was built with (automatic inside [[prunedEquiJoin]]).
    */
  def build(dim: DataFrame, dimKey: String, expectedKeys: Long,
            fpp: Double = 0.01): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(canonicalKey(dim, dimKey))),
      Literal(expectedKeys), Literal(numBits(expectedKeys, fpp)))
    dim.agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** The key in the type it is hashed as: integral types widen to
    * bigint, fractional to double, everything else to string — so two
    * columns that EQUI-JOIN equal also HASH equal regardless of
    * declared width.
    */
  def canonicalKey(df: DataFrame, key: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(key).cast("bigint")
      case FloatType | DoubleType | _: DecimalType =>
        col(key).cast("double")
      case _ => col(key).cast("string")
    }
  }

  /** Membership probe column for a pre-built filter. `key` must carry
    * the same canonicalization the filter was built with (see
    * [[canonicalKey]]).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** `fact ⋈ dim` with the fact side bloom-pruned before the shuffle.
    * Exact semantics (no false negatives + the real join afterwards);
    * `expectedKeys` sizes the filter — overestimating costs bits,
    * underestimating costs false-positive shuffle rows, never
    * correctness.
    *
    * Only join types that cannot null-extend the FACT side are allowed:
    * an outer join would have to keep fact rows with no dim match, and
    * those are exactly the rows the pre-filter removes.
    */
  def prunedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     expectedKeys: Long, fpp: Double = 0.01,
                     joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "leftsemi", "semi", "cross")(jt),
      s"BloomPrune.prunedEquiJoin: joinType '$joinType' would null-extend" +
        " or negate the pruned fact side (pruning drops exactly the" +
        " non-matching rows an outer/anti join must keep)")
    val bloom = build(dim, dimKey, expectedKeys, fpp)
    fact.filter(mightContain(bloom, canonicalKey(fact, factKey)))
      .join(dim, col(factKey) === col(dimKey), joinType)
  }
}
