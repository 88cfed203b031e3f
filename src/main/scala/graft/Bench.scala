package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints a SHORT total-first JSON line (the driver's
  * captured tail truncated round 1's single 4 KB line, leaving the gate
  * unparseable), then the full per-query map as a second line, and also
  * writes it to target/bench_queries.json. Failed queries are recorded
  * with time -1 and listed under "errors" instead of masquerading as a
  * fast timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=q1,q2 benches a subset (repeats allowed via
    // SPARK_GRAFT_REPEAT) — for isolating noisy measurements.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = (1 to repeat).flatMap(i => selected.map {
      case (n, f) => (if (repeat > 1) s"$n#$i" else n) -> f
    }).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val short = s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"errors":[${errors.mkString(",")}]}"""
    val full = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","errors":[${errors.mkString(",")}]}"""
    // Short line both first and last: whether the driver keeps the head or
    // the tail of stdout, a complete parseable JSON line survives.
    println(short)
    println(full)
    println(short)
    try {
      val p = java.nio.file.Paths.get("target/bench_queries.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, full.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
