package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fixture-encoding seam (round-6 regression class): `events.ts` has
  * shipped as ns-as-Long, as parquet timestamp[us] NTZ, and could ship
  * tz-adjusted. `Tables.tsAsNtz` (batch canon) and `Tables.tsAsTimestamp`
  * (streaming canon — watermarks/unix_micros reject NTZ) must map ALL
  * THREE to the same wall-clock instants under the pinned-UTC session.
  */
class TsNormalizeSpec extends SparkTestBase {

  // 2024-01-01 10:30:00.123456 UTC, as µs since epoch
  private val us = 1704105000123456L

  private def longDf: DataFrame = {
    import spark.implicits._
    Seq(us * 1000).toDF("ts") // legacy encoding: NANOSECONDS as LongType
  }
  private def ntzDf: DataFrame = {
    import spark.implicits._
    Seq(us).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
  }
  private def ltzDf: DataFrame = {
    import spark.implicits._
    Seq(us).toDF("us").select(timestamp_micros(col("us")).as("ts"))
  }

  test("tsAsTimestamp maps all three encodings to the same TIMESTAMP instant") {
    for (df <- Seq(longDf, ntzDf, ltzDf)) {
      val out = Tables.tsAsTimestamp(df)
      assert(out.schema("ts").dataType == TimestampType, df.schema.toString)
      assert(out.select(unix_micros(col("ts"))).head.getLong(0) == us)
    }
  }

  test("tsAsNtz maps all three encodings to the same NTZ wall clock") {
    val expect = ntzDf.select(col("ts").cast(StringType)).head.getString(0)
    for (df <- Seq(longDf, ntzDf, ltzDf)) {
      val out = Tables.tsAsNtz(df)
      assert(out.schema("ts").dataType == TimestampNTZType, df.schema.toString)
      assert(out.select(col("ts").cast(StringType)).head.getString(0) == expect)
    }
  }

  test("ns-long normalization floors (DuckDB ns->us truncation semantics)") {
    import spark.implicits._
    // ...999 ns must floor to ...0 µs, not round up
    val df = Seq(us * 1000 + 999).toDF("ts")
    assert(Tables.tsAsTimestamp(df)
      .select(unix_micros(col("ts"))).head.getLong(0) == us)
  }

  test("the fixture loader and streaming replay agree on events.ts") {
    val batch = Tables.load(spark, sf, "events")
    assert(batch.schema("ts").dataType == TimestampNTZType)
    val streamSide = Tables.tsAsTimestamp(
      spark.read.parquet(s"$sf/events.parquet"))
    assert(streamSide.schema("ts").dataType == TimestampType)
    // same wall-clock µs on both canons (UTC session => cast identity)
    val a = batch.select(unix_micros(col("ts").cast(TimestampType)))
      .agg(sum(col("unix_micros(CAST(ts AS TIMESTAMP))"))).head.getLong(0)
    val b = streamSide.select(unix_micros(col("ts")).as("u"))
      .agg(sum(col("u"))).head.getLong(0)
    assert(a == b)
  }
}
