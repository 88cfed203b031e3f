package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global ordering primitives — no single-task global window.
  *
  * Both helpers use the classic two-pass range-bucket pattern (the same
  * shape Spark's own distributed sort builds on): bucket rows by quantile
  * boundaries of the leading sort key so bucket boundaries respect the
  * global order, compute the running quantity locally per bucket, then
  * shift each bucket by the total of all earlier buckets. The only
  * driver-side data is the boundary array plus one (bucket, total) pair
  * per bucket — constant-size regardless of table size, so the pattern
  * survives a 100 TB input where `Window.orderBy(...)` without
  * partitionBy funnels everything through one task.
  *
  * Determinism note: the bucket id is a PURE FUNCTION of the row against
  * boundary values collected once and baked into the plan as literals, so
  * every re-execution of the (lazily recomputed) bucketed child assigns
  * identical buckets. The earlier `repartitionByRange` +
  * `spark_partition_id()` formulation did NOT have this property — its
  * sampled boundaries could differ between the offset-collection pass and
  * the ranking pass, silently corrupting ranks (caught by q_winsorize at
  * sf0.01). NULL keys bucket before all values, matching Spark's
  * ascending NULLS FIRST.
  */
object GlobalRank {

  private val PID = "__graft_pid"
  private val OFF = "__graft_off"
  private val LOC = "__graft_loc"
  private val KEY = "__graft_key"

  /** (bucketed-with-pid df, broadcastable (pid, offset-of-prior-buckets)
    * pairs, grand total) for `agg` of the per-bucket quantity. */
  private def offsets(df: DataFrame, nParts: Int, sortCols: Seq[Column],
                      perPartition: Column): (DataFrame, Seq[(Int, Long)], Long) = {
    val keyed = df.withColumn(KEY, sortCols.head.cast("double"))
    val probs = (1 until nParts).map(_.toDouble / nParts).toArray
    val bounds = keyed.stat.approxQuantile(KEY, probs, 0.001)
      .distinct.sorted
    val bucket = bounds.zipWithIndex
      .foldRight(lit(bounds.length): Column) { case ((b, i), acc) =>
        when(col(KEY) <= b, i).otherwise(acc)
      }
    val ranged = keyed
      .withColumn(PID, when(col(KEY).isNull, -1).otherwise(bucket))
      .drop(KEY)
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
