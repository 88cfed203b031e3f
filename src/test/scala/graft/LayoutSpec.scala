package graft

import graft.plans.Layout
import org.apache.spark.sql.functions._

/** Layout maintenance: compaction must be content-identity with fewer
  * files; clustered writes must be content-identity with ranged files. */
class LayoutSpec extends SparkTestBase {

  test("compactParquet merges a fragmented table without changing content") {
    val src = "target/tmp/layout_frag"
    val dst = "target/tmp/layout_compact"
    val li = Tables.load(spark, sf, "lineitem")
    li.repartition(16).write.mode("overwrite").parquet(src)
    assert(Layout.dataFileCount(src) >= 16)
    Layout.compactParquet(spark, src, dst, 2)
    assert(Layout.dataFileCount(dst) <= 2)
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dst)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("mortonKey matches a reference bit-interleave on a grid") {
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    import spark.implicits._
    val pts = for (a <- 0L to 7L; b <- 0L to 7L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.mortonKey(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b), s"morton($a,$b)")
    }
    // also spot-check large coordinates near the 31-bit boundary
    val big = Seq((0x7FFFFFFFL, 0L), (123456789L, 987654321L))
    val gotBig = big.toDF("a", "b")
      .select(Layout.mortonKey(col("a"), col("b"))).collect()
    big.zip(gotBig).foreach { case ((a, b), r) =>
      assert(r.getLong(0) == ref(a, b), s"morton($a,$b) large")
    }
  }

  test("writeZOrdered preserves content") {
    val dir = "target/tmp/layout_zorder"
    val cust = Tables.load(spark, sf, "customer")
    Layout.writeZOrdered(cust, dir, 4, "c_custkey", "c_nationkey")
    val back = spark.read.parquet(dir)
    assert(back.count() == cust.count())
    assert(cust.exceptAll(back).isEmpty && back.exceptAll(cust).isEmpty)
  }

  test("writeClustered preserves content and ranges files by the key") {
    val dir = "target/tmp/layout_clustered"
    val li = Tables.load(spark, sf, "lineitem")
    Layout.writeClustered(li, dir, 4, "l_shipdate")
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(li.exceptAll(back).isEmpty && back.exceptAll(li).isEmpty)
    // each physical file covers a disjoint-ish shipdate range: the file
    // with the global min and the file with the global max must differ
    val withFile = back.select(col("l_shipdate"),
      input_file_name().as("f"))
    val minF = withFile.orderBy("l_shipdate").select("f").head.getString(0)
    val maxF = withFile.orderBy(col("l_shipdate").desc).select("f")
      .head.getString(0)
    assert(minF != maxF, "range clustering produced overlapping extremes")
  }

  test("compactionPlan packs every byte once into near-target bins") {
    import spark.implicits._
    val sizes = Seq(
      "a" -> 500L, "b" -> 120L, "c" -> 80L, "d" -> 300L, "e" -> 40L,
      "f" -> 260L, "g" -> 10L, "h" -> 90L, "i" -> 200L, "j" -> 70L)
    val files = sizes.toDF("path", "length")
    val target = 400L
    val plan = Layout.compactionPlan(files, target).collect()
    // conservation: every file in exactly one bin, every byte accounted
    assert(plan.map(_.getAs[Long]("n_files")).sum == sizes.length)
    assert(plan.map(_.getAs[Long]("bin_bytes")).sum == sizes.map(_._2).sum)
    // bins are dense 0..k
    assert(plan.map(_.getAs[Long]("bin")).toSeq ==
      (0L until plan.length).toSeq)
    // packing bound: a bin STARTS before its boundary, so it can exceed
    // the target only by (a tail chunk of) one file — never by more than
    // the largest single file
    val maxFile = sizes.map(_._2).max
    plan.foreach { r =>
      assert(r.getAs[Long]("bin_bytes") <= target + maxFile,
        s"bin ${r.getAs[Long]("bin")} overpacked")
    }
    // deterministic across parallelism
    val p5 = {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      try Layout.compactionPlan(files, target).collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    assert(p5 == plan.map(_.toString).toSeq)
  }

  test("q_compaction_plan lists the fixture dir without loading content") {
    val out = operators.PipelineQueries.qCompactionPlan.run(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_files")).sum ==
      Layout.dataFileCount(sf).toLong)
  }

  test("bucketed tables join with zero shuffle exchanges, result identical") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeBucketed(li, "li_bkt", 4, "l_orderkey")
    Layout.writeBucketed(ord, "ord_bkt", 4, "o_orderkey")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.table("li_bkt")
      val b = spark.table("ord_bkt")
      val joined = a.join(b, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
