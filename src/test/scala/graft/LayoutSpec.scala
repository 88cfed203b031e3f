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
}
