package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global ordering primitives — no single-task global window.
  *
  * Both helpers use the classic two-pass range-partition pattern (the same
  * shape Spark's own distributed sort builds on): range-partition on the
  * sort key so partition boundaries respect the global order, compute the
  * running quantity locally per partition, then shift each partition by
  * the total of all earlier partitions. The only driver-side data is one
  * (partition_id, total) pair per partition — constant-size regardless of
  * table size, so the pattern survives a 100 TB input where
  * `Window.orderBy(...)` without partitionBy funnels everything through
  * one task.
  *
  * Determinism note: `repartitionByRange` samples with a fixed seed, so
  * re-executing the ranged child in the second pass reproduces identical
  * partition boundaries.
  */
object GlobalRank {

  private val PID = "__graft_pid"
  private val OFF = "__graft_off"
  private val LOC = "__graft_loc"

  /** (ranged-with-pid df, broadcastable (pid, offset-of-prior-partitions)
    * pairs, grand total) for `agg` of the per-partition quantity. */
  private def offsets(df: DataFrame, nParts: Int, sortCols: Seq[Column],
                      perPartition: Column): (DataFrame, Seq[(Int, Long)], Long) = {
    val ranged = df.repartitionByRange(nParts, sortCols: _*)
      .withColumn(PID, spark_partition_id())
    val totals = ranged.groupBy(PID).agg(perPartition.cast(LongType).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    val offs = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    (ranged, offs, totals.map(_._2).sum)
  }

  private def withOffset(ranged: DataFrame, offs: Seq[(Int, Long)],
                         local: Column, out: String): DataFrame = {
    val spark = ranged.sparkSession
    import spark.implicits._
    val offDf = offs.toDF(PID, OFF)
    ranged.withColumn(LOC, local)
      .join(broadcast(offDf), PID)
      .withColumn(out, col(OFF) + col(LOC))
      .drop(PID, OFF, LOC)
  }

  /** Adds a 1-based dense global row number by `sortCols` (which must be a
    * total order — include a unique tiebreak). Returns the augmented frame
    * and the total row count. */
  def withGlobalRowNumber(df: DataFrame, out: String, nParts: Int,
                          sortCols: Column*): (DataFrame, Long) = {
    val (ranged, offs, n) = offsets(df, nParts, sortCols, count(lit(1)))
    val w = Window.partitionBy(PID).orderBy(sortCols: _*)
    (withOffset(ranged, offs, row_number().over(w).cast(LongType), out), n)
  }

  /** Adds the inclusive global running sum of `value` by `sortCols`.
    * Exact for integral values; returns the augmented frame and the grand
    * total. */
  def withGlobalRunningSum(df: DataFrame, value: Column, out: String,
                           nParts: Int, sortCols: Column*): (DataFrame, Long) = {
    val (ranged, offs, n) = offsets(df, nParts, sortCols, sum(value))
    val w = Window.partitionBy(PID).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (withOffset(ranged, offs, sum(value.cast(LongType)).over(w), out), n)
  }

  /** Standard NTILE(k) bucket from a 1-based unique global rank: the first
    * n%k buckets get ceil(n/k) rows, the rest floor(n/k). */
  def ntileFromRank(rank: Column, n: Long, k: Int): Column = {
    val q = n / k
    val rem = n % k
    if (q == 0) rank // fewer rows than buckets: bucket i = row i
    else when(rank <= rem * (q + 1), floor((rank - 1) / (q + 1)) + 1)
      .otherwise(lit(rem) + floor((rank - lit(rem * (q + 1)) - 1) / q) + 1)
  }

  /** percent_rank from a 1-based unique global rank. */
  def percentRankFromRank(rank: Column, n: Long): Column =
    if (n <= 1) lit(0.0)
    else (rank - 1).cast("double") / lit((n - 1).toDouble)
}
