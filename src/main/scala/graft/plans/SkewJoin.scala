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
}
