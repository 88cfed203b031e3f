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

  /** (bucketed-with-pid df, per-quantity broadcastable (pid,
    * offset-of-prior-buckets) pairs, per-quantity grand totals) for the
    * given per-bucket quantities — ONE bucket-totals pass however many
    * running quantities are layered on the same global order. */
  private def offsetsMulti(df: DataFrame, nParts: Int, sortCols: Seq[Column],
      perPartition: Seq[Column]): (DataFrame, Seq[Seq[(Int, Long)]], Seq[Long]) = {
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
    require(perPartition.nonEmpty, "offsetsMulti needs at least one per-partition aggregate")
    // coalesce: a bucket whose aggregated column is all-NULL (e.g. a
    // sum over nothing but NULLs) must contribute 0 to the running
    // offsets, not NPE in getLong.
    val aggs = perPartition.zipWithIndex
      .map { case (c, i) => coalesce(c.cast(LongType), lit(0L)).as(s"t$i") }
    val rows = ranged.groupBy(PID).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getInt(0), perPartition.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1).toSeq
    val offs = perPartition.indices.map { i =>
      val ts = rows.map(_._2(i))
      rows.map(_._1).zip(ts.scanLeft(0L)(_ + _).dropRight(1))
    }
    (ranged, offs, perPartition.indices.map(i => rows.map(_._2(i)).sum))
  }

  private def offsets(df: DataFrame, nParts: Int, sortCols: Seq[Column],
                      perPartition: Column): (DataFrame, Seq[(Int, Long)], Long) = {
    val (ranged, offs, totals) =
      offsetsMulti(df, nParts, sortCols, Seq(perPartition))
    (ranged, offs.head, totals.head)
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

  /** Adds the inclusive global running sums of SEVERAL integral value
    * columns along the same global order in one pass (one bucket-totals
    * collect however many quantities) — e.g. the two per-group cumulative
    * counts a Kolmogorov–Smirnov statistic compares. Returns the
    * augmented frame and each quantity's grand total, in input order. */
  def withGlobalRunningSums(df: DataFrame, values: Seq[(Column, String)],
      nParts: Int, sortCols: Column*): (DataFrame, Seq[Long]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val (ranged, offs, totals) =
      offsetsMulti(df, nParts, sortCols, values.map(v => sum(v._1)))
    val spark = ranged.sparkSession
    val pids = offs.head.map(_._1)
    val offRows = pids.indices
      .map(j => Row.fromSeq(pids(j) +: offs.map(o => o(j)._2)))
    val offSchema = StructType(StructField(PID, IntegerType, nullable = false)
      +: values.indices.map(i => StructField(s"$OFF$i", LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val w = Window.partitionBy(PID).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val locals = values.zipWithIndex.map { case ((v, _), i) =>
      sum(v.cast(LongType)).over(w).as(s"$LOC$i")
    }
    val joined = ranged.select(col("*") +: locals: _*)
      .join(broadcast(offDf), PID)
    val out = values.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name, col(s"$OFF$i") + col(s"$LOC$i"))
    }
    val drop = Seq(PID) ++ values.indices.flatMap(i => Seq(s"$OFF$i", s"$LOC$i"))
    (out.drop(drop: _*), totals)
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
