package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The driver-equivalent session config, shared with PlanAudit. */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      // Typed Aggregators (TopKPairs, TopKSketch) keep constant-size
      // buffers per group; the default 128-distinct-keys fallback demotes
      // a per-user top-k over 100k+ users from hash to SORT-BASED
      // aggregation — i.e. sorts the full candidate stream, exactly the
      // shuffle-volume blowup the map-side top-k exists to avoid. 1M keys
      // of ≤k-pair buffers is a few MB of execution memory.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = session()
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q1,q2 dumps a subset for fast local iteration
    // (tools/check.py compares whatever dump dirs exist); the driver
    // leaves it unset and always dumps the full registry.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Same storage hygiene as Bench: warm the three MF-family memos up
    // front (so the shared caches land in the keep-set), then release
    // every persistent RDD a query pins once its dump is written — a
    // 267-query single-JVM run otherwise accumulates localCheckpoint and
    // internal-cache blocks until execution memory starves (round 6).
    val mfish = (n: String) => n.startsWith("q_mf") || n.startsWith("q_antidote") ||
      n.startsWith("q_metric") || n.startsWith("q_ratings") || n.startsWith("q_rec") ||
      n.startsWith("q_ndcg") || n.startsWith("q_negative")
    if (selected.keys.exists(mfish))
      try {
        ml.Ratings.viewCached(spark, sfDir)
        ml.AlsEngine.trainCachedOnRatingsView(spark, sfDir)
        ml.Baseline.polRmseCached(spark, sfDir)
      } catch { case _: Throwable => () }
    val keep = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def releaseNew(): Unit =
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) =>
          // MemoKeep: memoized localCheckpoints (SimSearch index cache,
          // co-occurrence memo) built mid-run — lineage is truncated, so
          // releasing them breaks every later consumer instead of
          // slowing it
          keep.contains(id) || MemoKeep.isProtected(id) }
        .values.foreach(r => try r.unpersist(blocking = false)
          catch { case _: Throwable => () })
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    var nOk = 0
    selected
      .foreach { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          nOk += 1
        } catch { case e: Throwable =>
          failed += name
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        releaseNew()
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Fail LOUDLY: a query that throws must be a red summary line and a
    // nonzero exit, never just a missing parquet dir (round 6 shipped 3
    // broken queries that way — they silently vanished from CORRECTNESS).
    println(s"""{"n_ok":$nOk,"n_failed":${failed.size},"failed":[${
      failed.map(q).mkString(",")}]}""")
    if (failed.nonEmpty) sys.exit(1)
  }
}
