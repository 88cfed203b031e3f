package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table-loading conventions for the graft engine.
  *
  * Fixture layout (TESTDATA.md): one parquet file per table under
  * `$sfDir/<name>.parquet`. At 100 TB these would be partitioned
  * directories (e.g. orders partitioned by month); the loader is the
  * single seam where that layout knowledge lives, so queries stay
  * layout-agnostic and partition pruning is a loader concern.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // nanosecond LongType (spark.sql.legacy.parquet.nanosAsLong=true, set
    // in Verify/Bench/tests). Normalize to microsecond TimestampType with
    // integral DIV — floor semantics, matching DuckDB's ns→us truncation.
    // NTZ keeps parity with the other fixture timestamps (parquet
    // isAdjustedToUTC=false), so every engine sees naive µs wall-clock.
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000"))
        .cast(org.apache.spark.sql.types.TimestampNTZType))
    else df
  }

  /** Register all fixture tables as temp views so SQL-first operators can
    * refer to them by bare name (mirrors the DuckDB oracle convention). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
