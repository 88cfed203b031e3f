package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  /** Number of data files currently backing a parquet directory. */
  def dataFileCount(dir: String): Int = {
    val d = new java.io.File(dir)
    if (!d.exists) 0
    else d.listFiles.count(f => f.getName.endsWith(".parquet"))
  }
}
