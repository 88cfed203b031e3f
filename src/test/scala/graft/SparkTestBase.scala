package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (same config surface as
  * Verify/Bench: UTC, ns-as-long parquet, small shuffle parallelism). */
object SparkTestSession {
  // Default 4 threads keeps unit tests light; the opt-in big-data sweeps
  // (PlanDriftSpec sf0.1/sf1 legs) can bump it via SPARK_GRAFT_TEST_CPUS
  // — plan COUNTS are parallelism-independent, so snapshots stay valid.
  private val cpus = sys.env.getOrElse("SPARK_GRAFT_TEST_CPUS", "4")
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // see Verify.session: keep typed top-k aggregations hash-based
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf: String = SparkTestSession.sf
}
