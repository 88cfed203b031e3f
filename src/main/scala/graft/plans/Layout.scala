package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout maintenance for large parquet corpora: the small-files
  * problem (a 100 TB table accreted from streaming microbatches or
  * per-partition appends degrades every scan with footer/open overhead)
  * and clustered writes (sort by the dominant filter column so parquet
  * row-group min/max statistics actually skip IO).
  */
object Layout {

  /** Rewrite a parquet directory into `targetFiles` similarly-sized files.
    * Uses repartition (round-robin) — content-preserving, no key
    * assumption; run per static partition for partitioned tables. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetFiles: Int): Unit =
    spark.read.parquet(inDir)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  /** Range-clustered write: repartitionByRange + sortWithinPartitions on
    * the cluster columns gives globally-ranged files AND sorted row
    * groups, so a filter on the leading cluster column prunes both whole
    * files (via AQE/stats) and row groups (via parquet min/max). */
  def writeClustered(df: DataFrame, dir: String, numFiles: Int,
      clusterCols: String*): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Bit-spread for 2-D Morton interleaving: the low 31 bits of `c`
    * spaced out to even bit positions. Pure built-in bitwise ops —
    * whole-stage-codegen'd, no UDF. */
  private def spread(c: Column): Column = {
    val m = Seq(
      0x0000FFFF0000FFFFL, 0x00FF00FF00FF00FFL, 0x0F0F0F0F0F0F0F0FL,
      0x3333333333333333L, 0x5555555555555555L)
    val shifts = Seq(16, 8, 4, 2, 1)
    var x: Column = c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
    m.zip(shifts).foreach { case (mask, s) =>
      x = x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(mask))
    }
    x
  }

  /** 2-D Z-order (Morton) key: interleaves the low 31 bits of two
    * non-negative int columns. Sorting by this key clusters rows that are
    * close in BOTH dimensions into the same files/row groups, so parquet
    * min/max statistics skip IO for 2-D range predicates — the multi-
    * column analog of `writeClustered`. */
  def mortonKey(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Z-order-clustered write over two dimensions. */
  def writeZOrdered(df: DataFrame, dir: String, numFiles: Int,
      colA: String, colB: String): Unit =
    df.withColumn("graft_z", mortonKey(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Bucketed table write: hash-partition rows into `buckets` files by
    * `bucketCol` and sort within each bucket. A pair of tables bucketed
    * on their join keys with the same bucket count joins WITHOUT ANY
    * SHUFFLE — the scan's bucketing IS the join's required hash
    * partitioning, so Catalyst elides both exchanges (and with sorted
    * buckets, both sorts). At 100 TB this converts every recurring
    * fact⋈fact join on the bucket key from the dominant shuffle into a
    * co-located merge — the single biggest plan-shape lever for a
    * repeatedly-joined table. Spark's bucketing metadata lives in the
    * catalog, hence saveAsTable (path-only parquet has nowhere to record
    * it); LayoutSpec proves the exchange-free plan + result identity. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCol: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // An in-memory catalog forgets managed tables between sessions while
    // the warehouse directory persists; Overwrite cannot replace a
    // location the catalog has no entry for, so clear any orphan first.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Compaction PLAN over a (path, length) file listing: which small
    * files merge into which target-sized output, decided from metadata
    * alone — the planning half of `compactParquet`, separated so a 100 TB
    * table's nightly maintenance job can cost the rewrite before touching
    * a byte of data. Files are laddered by (size desc, path) and packed
    * sequentially: bin = floor(cumulative-bytes-before / targetBytes).
    * The cumulative sum runs through `GlobalRank.withGlobalRunningSum`
    * (two-pass range buckets — a 100 TB table's file listing is itself
    * millions of rows, which is exactly when a single-task global window
    * dies). Deterministic: pure function of (path, length). */
  def compactionPlan(files: DataFrame, targetBytes: Long): DataFrame = {
    val (cum, _) = GlobalRank.withGlobalRunningSum(
      files.select(col("path"), col("length")),
      col("length"), "cum", 8, -col("length"), col("path"))
    cum.withColumn("bin",
        floor((col("cum") - col("length")).cast("double") / targetBytes)
          .cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum(col("length")).as("bin_bytes"),
        min(col("path")).as("first_file"), max(col("path")).as("last_file"))
      .orderBy("bin")
  }

  /** Number of data files currently backing a parquet directory. */
  def dataFileCount(dir: String): Int = {
    val d = new java.io.File(dir)
    if (!d.exists) 0
    else d.listFiles.count(f => f.getName.endsWith(".parquet"))
  }
}
