package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (guide §1) for q_mf_compact_train: time each phase
  * of the trainCompacted path — the two id-dictionary builds, the
  * compaction join, the ALS train, and the factor re-key joins — so the
  * one remaining >5 s non-intrinsic MF cell is optimized from evidence
  * (VERDICT r14 task 3). Not a registered query; stdout only. */
object ProfileCompact {
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
    def timed[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val ratings = timed("ratings_view") {
      val v = graft.ml.Ratings.viewCached(spark, sfDir)
      v.count(); v
    }
    val shifted = ratings.select(
      (col("user_id") + 5000000000L).as("user_id"),
      (col("item_id") + 6000000000L).as("item_id"), col("rating"))
    // Phase timings, one action per phase (noop-equivalent count on
    // narrow frames). Two full passes: run1 cold-JIT, run2 warm.
    (1 to 2).foreach { i =>
      val uDict = timed(s"run$i:uDict_build") {
        val dd = graft.ml.AlsEngine.idDictionary(shifted, "user_id")
        dd.count(); dd
      }
      val iDict = timed(s"run$i:iDict_build") {
        val dd = graft.ml.AlsEngine.idDictionary(shifted, "item_id")
        dd.count(); dd
      }
      val compacted = timed(s"run$i:compact_join") {
        val c = shifted
          .join(uDict.withColumnRenamed("idx", "__u"), "user_id")
          .join(iDict.withColumnRenamed("idx", "__i"), "item_id")
          .select(col("__u").cast("long").as("user_id"),
            col("__i").cast("long").as("item_id"), col("rating"))
        c.write.format("noop").mode("overwrite").save(); c
      }
      graft.ml.AlsEngine.clearCache()
      val model = timed(s"run$i:train") {
        graft.ml.AlsEngine.train(compacted,
          graft.ml.AlsEngine.Config(maxIter = 3))
      }
      timed(s"run$i:rekey_and_agg") {
        val uf = model.userFactors
          .join(uDict, model.userFactors("id") === uDict("idx"))
          .select(col("user_id"), col("features"))
        val itf = model.itemFactors
          .join(iDict, model.itemFactors("id") === iDict("idx"))
          .select(col("item_id"), col("features"))
        uf.agg(count(lit(1)), min(col("user_id")))
          .crossJoin(itf.agg(count(lit(1)), max(col("item_id"))))
          .collect()
      }
      timed(s"run$i:full_query") {
        graft.SparkEntry.queries.toMap.apply("q_mf_compact_train")(
          spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
