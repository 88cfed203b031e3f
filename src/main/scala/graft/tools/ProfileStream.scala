package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.LongType

/** Measurement harness (guide §1; VERDICT r14 task 6): split the
  * streaming maintainers' per-query wall into (a) the micro-batch engine
  * floor (offset/commit logs, per-trigger file listing, planning),
  * (b) the per-batch compute, and (c) the versioned-parquet state
  * read/merge/write — by replaying the SAME 4-slice AvailableNow stream
  * with three foreachBatch bodies: no-op, partial-agg only, and the full
  * q_stream_incr_agg maintenance loop. If (a) dominates, the family is
  * at the engine floor and cutting it would mean faking the replay
  * semantics — the adjudication PERF.md carries. Not a registered
  * query; stdout only. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-32s $dt%8.3f s")
      dt
    }
    def replay(body: (DataFrame, Long) => Unit): Unit = {
      val stream = graft.streaming.StreamOps.sliceStream(spark, sfDir, 4)._1
        .select(col("ts"), col("event_type"))
      val q = stream.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch(body)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val work = java.nio.file.Files
      .createTempDirectory("profile_stream").toString
    // one throwaway warm replay (JIT + slice memo), then 2× each leg
    replay((_, _) => ())
    (1 to 2).foreach { i =>
      timed(s"run$i:engine_floor_noop") { replay((_, _) => ()) }
      timed(s"run$i:plus_partial_agg") {
        replay { (batch, _) =>
          batch.groupBy(date_trunc("day", col("ts")).as("day"),
              col("event_type"))
            .agg(count(lit(1)).as("cnt"))
            .write.format("noop").mode("overwrite").save()
        }
      }
      timed(s"run$i:full_state_maintenance") {
        val stateBase = s"$work/state_$i"
        @volatile var version = -1L
        replay { (batch, batchId) =>
          val partial = batch
            .groupBy(date_trunc("day", col("ts")).as("day"),
              col("event_type"))
            .agg(count(lit(1)).as("cnt"))
          val merged =
            if (version < 0) partial
            else spark.read.parquet(s"$stateBase/v$version")
              .unionByName(partial)
              .groupBy("day", "event_type")
              .agg(sum(col("cnt")).cast(LongType).as("cnt"))
          merged.write.mode("overwrite").parquet(s"$stateBase/v$batchId")
          version = batchId
        }
      }
    }
    spark.stop()
  }
}
