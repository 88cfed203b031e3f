package graft

import graft.functions.TopKSketch
import graft.plans.BloomPrune
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Guarantees of the sketch-based scale primitives: Space-Saving
  * overestimates + heavy-hitter capture, and Bloom pruning's zero
  * false negatives. */
class SketchSpec extends SparkTestBase {

  private def toks = Tables.load(spark, sf, "documents")
    .select(explode(split(col("text"), " ")).as("term"))

  test("space-saving: every estimate >= true count, top-1 captured") {
    val sk = udaf(new TopKSketch(128), Encoders.STRING)
    val sketch = toks.agg(sk(col("term")).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e").getField("_1").as("term"),
        col("e").getField("_2").as("est"))
    val exact = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val joined = sketch.join(exact, "term")
    assert(joined.filter(col("est") < col("cnt")).count() == 0,
      "space-saving must never underestimate")
    val top1 = exact.orderBy(col("cnt").desc, col("term"))
      .select("term").head.getString(0)
    assert(sketch.filter(col("term") === top1).count() == 1,
      s"top token '$top1' missing from sketch")
  }

  test("space-saving: capacity bounds the sketch size across partitions") {
    val sk = udaf(new TopKSketch(16), Encoders.STRING)
    val n = toks.repartition(8).agg(sk(col("term")).as("s"))
      .select(size(col("s"))).head.getInt(0)
    assert(n <= 16 && n > 0)
  }

  test("hll re-aggregation: daily-sketch rollup == whole-table sketch, " +
    "and tracks exact distinct counts") {
    val ev = Tables.load(spark, sf, "events")
    val rolled = Tables.load(spark, sf, "events")
      .withColumn("day",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"))
      .groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val whole = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
    val j = rolled.withColumnRenamed("est", "rolled")
      .join(whole.withColumnRenamed("est", "whole"), "event_type")
      .join(exact, "event_type").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (ro, wh, ex) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ro == wh, s"rollup $ro != whole-sketch $wh (not associative?)")
      assert(math.abs(ro - ex) <= math.max(1, ex / 10),
        s"estimate $ro too far from exact $ex")
    }
  }

  test("kmv: slice-sketch merge == whole-table sketch == sorted bottom-k, " +
    "estimate within 25% of exact") {
    val k = 32
    val sk = udaf(new graft.functions.KmvSketch(k), Encoders.scalaLong)
    val h = Tables.load(spark, sf, "lineitem")
      .select(conv(substring(md5(col("l_orderkey").cast("string")), 1, 15),
        16, 10).cast("long").as("hv"))
    // mergeability: per-slice sketches (hash-sliced 4 ways) re-aggregated
    // must equal the single-pass sketch — the property that makes the
    // sketch partial-aggregate map-side and re-aggregate across days
    val whole = h.agg(sk(col("hv")).as("mins")).head.getSeq[Long](0)
    val merged = h.withColumn("slice", pmod(col("hv"), lit(4)))
      .groupBy("slice").agg(sk(col("hv")).as("mins"))
      .select(explode(col("mins")).as("hv"))
      .agg(sk(col("hv")).as("mins")).head.getSeq[Long](0)
    assert(merged == whole, "slice-merged sketch != whole-table sketch")
    // ground truth: the k smallest distinct hashes by explicit sort
    val sorted = h.distinct().orderBy("hv").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(whole == sorted, "sketch minima != sorted bottom-k")
    val exact = h.distinct().count()
    val est = (k - 1).toDouble * math.pow(2, 60) / whole.last
    assert(math.abs(est - exact) <= 0.25 * exact,
      s"KMV estimate $est too far from exact $exact")
  }

  test("bloom prune rejects non-integral keys (lossy cast would drop rows)") {
    val li = Tables.load(spark, sf, "lineitem")
    val ord = Tables.load(spark, sf, "orders")
    intercept[IllegalArgumentException] {
      BloomPrune.prune(li, col("l_returnflag"), ord, col("o_orderkey"), 100L)
    }
  }

  test("bloom prune: no false negatives, join result exact") {
    val li = Tables.load(spark, sf, "lineitem")
    val ord = Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val exact = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    val pruned = BloomPrune.prune(li, col("l_orderkey"), ord,
      col("o_orderkey"), expectedItems = 10000L)
    assert(pruned.count() <= li.count())
    val joined = BloomPrune.prunedJoin(li, "l_orderkey", ord, "o_orderkey",
      expectedItems = 10000L).count()
    assert(joined == exact, s"pruned join $joined != exact $exact")
    // every truly-matching row must survive the bloom filter
    val matches = li.join(ord.select("o_orderkey").distinct(),
      col("l_orderkey") === col("o_orderkey")).select("l_orderkey", "l_linenumber")
    val survived = pruned.select("l_orderkey", "l_linenumber")
    assert(matches.except(survived).isEmpty, "bloom dropped a true match")
  }
}
