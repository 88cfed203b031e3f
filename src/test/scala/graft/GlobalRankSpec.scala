package graft

import graft.plans.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-pass distributed global rank / running sum must agree exactly
  * with the single-task global-window ground truth (which we only ever use
  * here, at test scale, as the oracle). */
class GlobalRankSpec extends SparkTestBase {

  private def fixture = {
    import spark.implicits._
    // seeded pseudo-random keys WITH duplicates in the sort column — the
    // unique id tiebreak is what makes the order total
    (0L until 500L).map(i => (i, (i * 2654435761L % 97).toDouble, (i * 13 % 29) + 1))
      .toDF("id", "key", "v")
      .repartition(13)
  }

  test("withGlobalRowNumber matches window row_number over any partitioning") {
    val df = fixture
    val (ranked, n) = GlobalRank.withGlobalRowNumber(
      df, "g_rank", 8, col("key"), col("id"))
    assert(n == 500)
    val oracle = df.withColumn("rn",
      row_number().over(Window.orderBy("key", "id")).cast("long"))
    val diffs = ranked.join(oracle, "id")
      .filter(col("g_rank") =!= col("rn")).count()
    assert(diffs == 0)
  }

  test("withGlobalRunningSum matches the window running sum") {
    val df = fixture
    val (run, total) = GlobalRank.withGlobalRunningSum(
      df, col("v"), "rs", 8, col("key"), col("id"))
    assert(total == fixture.agg(sum(col("v"))).head().getLong(0))
    val oracle = df.withColumn("ors",
      sum(col("v")).over(Window.orderBy("key", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val diffs = run.join(oracle, "id")
      .filter(col("rs") =!= col("ors")).count()
    assert(diffs == 0)
  }

  test("constant sort key (worst-case skew) still ranks correctly via the tiebreak") {
    import spark.implicits._
    // every row has the SAME key — only the unique id tiebreak orders them;
    // range partitioning must still split the data across partitions
    val df = (0L until 300L).map(i => (i, 1.0)).toDF("id", "key")
      .repartition(7)
    val (ranked, n) = GlobalRank.withGlobalRowNumber(
      df, "g_rank", 8, col("key"), col("id"))
    assert(n == 300)
    val bad = ranked.filter(col("g_rank") =!= col("id") + 1).count()
    assert(bad == 0)
    // ...and the work was actually distributed (more than one partition
    // carried rows)
    val parts = df.repartitionByRange(8, col("key"), col("id"))
      .select(spark_partition_id()).distinct().count()
    assert(parts > 1, s"range partitioning collapsed to $parts partition(s)")
  }

  test("regression: real table with duplicate double keys ranks exactly " +
    "(bucket ids must be execution-independent — the repartitionByRange+" +
    "spark_partition_id formulation failed here)") {
    val ev = Tables.load(spark, sf, "events").select("event_id", "value")
    val (ranked, n) = GlobalRank.withGlobalRowNumber(
      ev, "g_rank", 32, col("value"), col("event_id"))
    assert(n == ev.count())
    val w = Window.orderBy("value", "event_id")
    val want = ev.withColumn("g_rank", row_number().over(w).cast("long"))
    assert(ranked.except(want).isEmpty && want.except(ranked).isEmpty)
    // ranks are a permutation of 1..n: no duplicates, no overshoot
    assert(ranked.agg(max("g_rank")).head.getLong(0) == n)
    assert(ranked.select("g_rank").distinct().count() == n)
  }

  test("ntileFromRank and percentRankFromRank match Spark's window forms") {
    val df = fixture
    val (ranked, n) = GlobalRank.withGlobalRowNumber(
      df, "g_rank", 8, col("key"), col("id"))
    for (k <- Seq(3, 4, 7, 499, 500, 501)) {
      val mine = ranked.select(col("id"),
        GlobalRank.ntileFromRank(col("g_rank"), n, k).cast("int").as("q"))
      val oracle = df.select(col("id"),
        ntile(k).over(Window.orderBy("key", "id")).as("oq"))
      assert(mine.join(oracle, "id").filter(col("q") =!= col("oq")).count() == 0,
        s"ntile($k) diverged")
    }
    val pr = ranked.select(col("id"),
      round(GlobalRank.percentRankFromRank(col("g_rank"), n), 9).as("p"))
    val opr = df.select(col("id"),
      round(percent_rank().over(Window.orderBy("key", "id")), 9).as("op"))
    assert(pr.join(opr, "id").filter(col("p") =!= col("op")).count() == 0)
  }
}
