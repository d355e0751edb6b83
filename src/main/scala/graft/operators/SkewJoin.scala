package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §2.b joins at scale).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default here) splits oversized shuffle partitions at runtime and
  * is the first line of defense. Salting is the explicit fallback for
  * the case AQE can't fix: a single join KEY too hot for any partition
  * split — e.g. one user_id holding 1% of a 100 TB fact table.
  *
  * Mechanics: the skewed (large) side gets a random-ish salt in
  * [0, saltFactor); the small side is replicated saltFactor× with every
  * salt value; the join key becomes (key, salt), spreading one hot key
  * over saltFactor reducers. Cost: small side shuffles saltFactor× its
  * size — use only for the keys that need it (pass `skewedKeys` to salt
  * selectively, leaving the rest of the join untouched).
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, salting all keys.
    * Salt is derived deterministically from a row hash, not rand(), so
    * retried tasks produce identical output (rand() in a join key breaks
    * Spark's task-retry semantics).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col).toSeq: _*)),
        lit(saltFactor)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(typedLit((0 until saltFactor).toList)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Selective variant: only rows whose key is in `skewedKeys` are
    * salted; the rest join normally. The union of the two joins equals
    * the plain join, but hot keys fan out over saltFactor reducers.
    */
  def saltedJoinSelective(large: DataFrame, small: DataFrame, key: String,
                          skewedKeys: Seq[Any],
                          saltFactor: Int = 8): DataFrame = {
    val isHot = coalesce(col(key).isin(skewedKeys: _*), lit(false))
    val hot = saltedJoin(large.filter(isHot), small.filter(isHot),
      key, saltFactor)
    val cold = large.filter(!isHot).join(small.filter(!isHot), Seq(key))
    hot.unionByName(cold)
  }
}
