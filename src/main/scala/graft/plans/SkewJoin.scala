package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation: salted replication join.
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * static fallback when one hot key dwarfs everything (the classic
  * power-law user/item case). The large side gets a deterministic salt in
  * [0, saltFactor); the small side is replicated once per salt value, and
  * the join key becomes (key, salt) — the hot key's rows now spread over
  * saltFactor tasks. Result set is provably identical to the unsalted
  * join.
  */
object SkewJoin {

  def saltedEquiJoin(large: DataFrame, small: DataFrame, largeKey: String,
      smallKey: String, saltFactor: Int): DataFrame = {
    // deterministic per-row salt: hash of the whole large row
    val salted = large.withColumn("_salt",
      pmod(hash(struct(large.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) &&
          salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Hybrid salting: replicate the small side ONLY for detected hot keys.
    * Full salting replicates the whole small side saltFactor× — at 100 TB
    * that replication dwarfs the skew it cures when only a handful of
    * keys are hot (the power-law case). Here the top-`hotKeyCount` keys
    * by large-side frequency (one TakeOrdered aggregate — driver holds
    * just the key list) are routed through the salted join; everything
    * else takes the plain join. Result set is identical to the plain
    * equi-join: the two branches partition the large side by key
    * membership, and each branch joins exactly. */
  def hybridSaltedJoin(large: DataFrame, small: DataFrame, largeKey: String,
      smallKey: String, saltFactor: Int, hotKeyCount: Int): DataFrame = {
    val hot = large.groupBy(largeKey).count()
      .orderBy(col("count").desc, col(largeKey))
      .limit(hotKeyCount)
      .select(largeKey).collect().map(_.get(0))
    if (hot.isEmpty) large.join(small, col(largeKey) === col(smallKey))
    else {
      val isHot = col(largeKey).isin(hot.toIndexedSeq: _*)
      val smallHot = small.filter(col(smallKey).isin(hot.toIndexedSeq: _*))
      val plain = large.filter(!isHot)
        .join(small, col(largeKey) === col(smallKey))
      val skewed = saltedEquiJoin(large.filter(isHot), smallHot,
        largeKey, smallKey, saltFactor)
      plain.unionByName(skewed)
    }
  }
}
