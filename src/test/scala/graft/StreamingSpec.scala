package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** True streaming semantics with controlled arrival order (MemoryStream):
  * watermark late-drop, stateful dedup, mapGroupsWithState. */
class StreamingSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Evt(event_id: Long, ts: Timestamp, event_type: String)

  test("watermark drops rows arriving later than the delay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val agg = StreamOps.tumblingCounts(ms.toDF(), "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append()).start()
    def add(rows: Evt*): Unit = { ms.addData(rows); q.processAllAvailable() }

    add(Evt(1, ts("2024-01-01 10:00:00"), "view"),
      Evt(2, ts("2024-01-01 10:05:00"), "view"))
    add(Evt(3, ts("2024-01-01 11:30:00"), "view"))
    // watermark is now 11:20 — this 10:10 row is late and must be dropped
    add(Evt(4, ts("2024-01-01 10:10:00"), "view"),
      Evt(5, ts("2024-01-01 11:40:00"), "view"))
    add(Evt(6, ts("2024-01-01 13:00:00"), "view"))
    add(Evt(7, ts("2024-01-01 13:30:00"), "view"))
    q.stop()

    val counts = spark.table("wm_test")
      .select(col("window_start").cast("string"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("2024-01-01 10:00:00") == 2, s"late row not dropped: $counts")
    assert(counts("2024-01-01 11:00:00") == 2)
  }

  test("dropDuplicatesWithinWatermark emits each event_id once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val q = StreamOps.dedupWithinWatermark(ms.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    ms.addData(Seq(
      Evt(1, ts("2024-01-01 10:00:00"), "view"),
      Evt(1, ts("2024-01-01 10:00:30"), "view"),
      Evt(2, ts("2024-01-01 10:01:00"), "click")))
    q.processAllAvailable()
    ms.addData(Seq(Evt(1, ts("2024-01-01 10:02:00"), "view")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_test").select("event_id").collect()
      .map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L))
  }

  test("mapGroupsWithState keeps running per-user counts across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Long]
    val counts = StreamOps.runningUserCounts(
      ms.toDF().select(col("value").as("user_id")))
    val q = counts.toDF("user_id", "n").writeStream.format("memory")
      .queryName("state_test").outputMode(OutputMode.Update()).start()
    ms.addData(1L, 1L, 2L); q.processAllAvailable()
    ms.addData(1L, 2L, 2L); q.processAllAvailable()
    q.stop()
    val rows = spark.table("state_test").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.contains((1L, 2L)) && rows.contains((1L, 3L)),
      s"user 1 state not carried: ${rows.toSeq}")
    assert(rows.contains((2L, 3L)))
  }

  test("streaming top-behavior carries the sketch across microbatches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val top = StreamOps.streamingTopBehavior(
      ms.toDF().toDF("user_id", "event_type"), capacity = 8)
    val q = top.toDF("user_id", "top", "est").writeStream.format("memory")
      .queryName("topk_state_test").outputMode(OutputMode.Update()).start()
    ms.addData((1L, "view"), (1L, "view"), (1L, "click"))
    q.processAllAvailable()
    ms.addData((1L, "click"), (1L, "click"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("topk_state_test").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // batch 1: view leads 2-1; batch 2: click overtakes 3-2 via carried state
    assert(rows.contains((1L, "view", 2L)), rows.toSeq.toString)
    assert(rows.contains((1L, "click", 3L)), rows.toSeq.toString)
  }

  test("stream-static join enriches microbatches with the dimension") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Long]
    val customer = Tables.load(spark, sf, "customer")
    val joined = StreamOps.enrichWithStatic(
      ms.toDF().select(col("value").as("user_id")),
      customer, "user_id", "c_custkey")
      .select("user_id", "c_mktsegment")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    ms.addData(0L, 1L, 2L); q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getString(1).nonEmpty))
  }

  test("foreachBatch parquet sink writes idempotent batch-keyed paths") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val dir = "target/tmp/foreachbatch_sink"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    ms.addData(Seq(Evt(1, ts("2024-01-01 10:00:00"), "view"),
      Evt(2, ts("2024-01-01 10:05:00"), "click")))
    StreamOps.runForeachBatchParquet(
      ms.toDF().groupBy("event_type").count(), dir)
    val written = spark.read.parquet(s"$dir/batch=0")
    assert(written.count() == 2)
  }

  test("custom flatMapGroupsWithState sessionizer closes on event-time timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val sessions = StreamOps.customSessionize(
      ms.toDF().select(col("event_id").as("user_id"), col("ts")), 30)
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("custom_sess").outputMode(OutputMode.Append()).start()
    // one session for user 7: events at 10:00 and 10:10
    ms.addData(Seq(Evt(7, ts("2024-01-01 10:00:00"), "view"),
      Evt(7, ts("2024-01-01 10:10:00"), "view")))
    q.processAllAvailable()
    // push the watermark far past 10:40 so the timeout fires
    ms.addData(Seq(Evt(8, ts("2024-01-01 14:00:00"), "view")))
    q.processAllAvailable()
    ms.addData(Seq(Evt(8, ts("2024-01-01 15:00:00"), "view")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("custom_sess")
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3)))
    assert(rows.contains((7L, "2024-01-01 10:00:00", "2024-01-01 10:40:00", 2)),
      rows.toSeq.toString)
    // gap-split: user 8's 15:00 event exceeds 14:00 + 30min, so the open
    // 14:00 session closes as its own session instead of merging
    assert(rows.contains((8L, "2024-01-01 14:00:00", "2024-01-01 14:30:00", 1)),
      rows.toSeq.toString)
  }

  test("session_window boundary: an event at exactly last+gap MERGES (verified)") {
    import spark.implicits._
    // Verified empirically (round-1 ADVICE raised the question): Spark
    // merges sessions that touch at exactly last+gap — the boundary event
    // stays in the SAME session. The q_stream_session oracle's strict
    // `ts - lag(ts) > INTERVAL 30 MINUTE` flag therefore matches Spark;
    // this test pins the semantics so a Spark upgrade flipping it fails
    // loudly here rather than silently in the hash gate.
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:01"))
    ).toDF("user_id", "ts")
    val n = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count().count()
    assert(n == 2, s"exact-gap event must merge, 1s-past-gap must split: $n")
  }

  test("stream-stream interval join pairs views with in-window clicks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val joined = StreamOps.viewClickJoin(
      ms.toDF().select(col("event_id").as("user_id"), col("ts"),
        col("event_type")))
    val q = joined.writeStream.format("memory").queryName("ss_interval")
      .outputMode(OutputMode.Append()).start()
    ms.addData(Seq(
      Evt(1, ts("2024-01-01 10:00:00"), "view"),
      Evt(1, ts("2024-01-01 10:03:00"), "click"), // in window → match
      Evt(1, ts("2024-01-01 10:20:00"), "click"), // beyond 5 min → no match
      Evt(2, ts("2024-01-01 10:01:00"), "click"))) // no prior view
    q.processAllAvailable()
    ms.addData(Seq(Evt(9, ts("2024-01-01 12:00:00"), "view")))
    q.processAllAvailable() // advance watermark so results flush
    q.stop()
    val rows = spark.table("ss_interval")
      .select(col("user_id"), col("click_ts").cast("string")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "2024-01-01 10:03:00")), rows.toSeq.toString)
  }

  test("stream-stream LEFT OUTER join emits unmatched views after watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val joined = StreamOps.viewClickLeftJoin(
      ms.toDF().select(col("event_id").as("user_id"), col("ts"),
        col("event_type")))
    val q = joined.writeStream.format("memory").queryName("ss_left_outer")
      .outputMode(OutputMode.Append()).start()
    ms.addData(Seq(
      Evt(1, ts("2024-01-01 10:00:00"), "view"),
      Evt(1, ts("2024-01-01 10:03:00"), "click"), // in window → matched
      Evt(2, ts("2024-01-01 10:01:00"), "view"))) // no click ever
    q.processAllAvailable()
    // the GLOBAL watermark is the min over BOTH inputs, so both the view
    // and the click side need late events to advance it past the join
    // window; and since the watermark computed at the END of a batch only
    // takes effect in the NEXT one, a second nudge batch triggers the
    // eviction that emits the outer row
    ms.addData(Seq(Evt(9, ts("2024-01-01 12:00:00"), "view"),
      Evt(9, ts("2024-01-01 12:00:00"), "click")))
    q.processAllAvailable()
    ms.addData(Seq(Evt(10, ts("2024-01-01 12:30:00"), "view"),
      Evt(10, ts("2024-01-01 12:30:00"), "click")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_left_outer")
      .select(col("user_id"), col("click_ts").cast("string"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
      .toSet
    assert(rows.contains((1L, Some("2024-01-01 10:03:00"))), rows.toString)
    assert(rows.contains((2L, None)), // the outer row, emitted on finalize
      rows.toString)
  }

  test("stateful streaming runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Evt]
      val agg = ms.toDF().withWatermark("ts", "10 minutes")
        .groupBy(col("event_type")).count()
      val q = agg.writeStream.format("memory").queryName("rocksdb_test")
        .outputMode(OutputMode.Complete()).start()
      ms.addData(Seq(Evt(1, ts("2024-01-01 10:00:00"), "view"),
        Evt(2, ts("2024-01-01 10:01:00"), "view")))
      q.processAllAvailable()
      ms.addData(Seq(Evt(3, ts("2024-01-01 10:02:00"), "view")))
      q.processAllAvailable()
      q.stop()
      val n = spark.table("rocksdb_test")
        .filter(col("event_type") === "view")
        .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
      assert(n == 3) // state carried across batches in RocksDB
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  /** Run `body` with the streaming state store pinned to RocksDB — the
    * production backend for 100 TB state — restoring the prior provider
    * afterwards. */
  private def underRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("RocksDB parity: the REAL fixture replay (q_stream_late path) " +
      "returns byte-identical windows under both state store providers") {
    // The replay is the engine's production streaming shape: file-source
    // over the events fixture, watermark, tumbling agg, AvailableNow.
    // Its windowed-aggregation state lives in the state store, so this is
    // the maintainer replay the verdict wants exercised on RocksDB.
    def run(): Seq[(String, String, Long)] =
      StreamOps.runToCompletion(StreamOps.tumblingCounts(
          StreamOps.replayEvents(spark, sf), "1 hour", "10 minutes"))
        .select(col("window_start").cast("string"), col("event_type"),
          col("cnt"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val dflt = run()
    val rocks = underRocksDb(run())
    assert(dflt.nonEmpty)
    assert(rocks == dflt,
      "RocksDB state store changed the replay's windowed counts")
  }

  test("RocksDB parity: dropDuplicatesWithinWatermark keeps the same " +
      "survivor set as the default provider") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def run(): Seq[Long] = {
      val ms = MemoryStream[Evt]
      val name = s"rocksdb_dedup_${System.nanoTime()}"
      val q = StreamOps.dedupWithinWatermark(ms.toDF(), "1 hour")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      ms.addData(Seq(
        Evt(1, ts("2024-01-01 10:00:00"), "view"),
        Evt(1, ts("2024-01-01 10:00:30"), "view"),
        Evt(2, ts("2024-01-01 10:01:00"), "click")))
      q.processAllAvailable()
      // duplicate of 1 inside the watermark window → still dropped;
      // advance event time past the watermark, then 1 may legally reappear
      ms.addData(Seq(Evt(1, ts("2024-01-01 10:02:00"), "view"),
        Evt(3, ts("2024-01-01 12:30:00"), "view")))
      q.processAllAvailable()
      ms.addData(Seq(Evt(1, ts("2024-01-01 12:31:00"), "view")))
      q.processAllAvailable()
      q.stop()
      spark.table(name).select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq
    }
    val dflt = run()
    val rocks = underRocksDb(run())
    assert(dflt.nonEmpty && dflt.count(_ == 2L) == 1)
    assert(rocks == dflt,
      s"RocksDB dedup survivors $rocks != default $dflt")
  }

  test("batch session windows match the gaps-and-islands oracle shape") {
    val sessions = operators.StreamingQueries.qStreamSession.run(spark, sf)
    val n = sessions.count()
    assert(n > 0)
    // session invariant: end - start >= the 30-minute gap
    val bad = sessions.filter(
      col("session_end").cast("timestamp").cast("long") -
        col("session_start").cast("timestamp").cast("long") < 30 * 60).count()
    assert(bad == 0)
  }

  test("incrementalDailyCounts maintains state across real micro-batches " +
      "and lands on the batch answer") {
    val dir = "target/test_stream_incr"
    val out = StreamOps.incrementalDailyCounts(spark, sf, dir)
    val direct = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)
    assert(out.count() > 0)
    // ≥2 state versions on disk proves the merge path (not just the
    // first-batch passthrough) actually executed
    val versions = new java.io.File(s"$dir/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
  }

  test("incrementalChecksum's streamed digests equal the one-shot batch digest") {
    val dir = "target/test_stream_cksum"
    val out = StreamOps.incrementalChecksum(spark, sf, dir)
    val h = conv(substring(md5(concat_ws("|", col("event_id"),
      col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")))), 1, 15), 16, 10)
      .cast("long")
    val mod = 1099511627776L
    val direct = Tables.load(spark, sf, "events")
      .select(col("event_type"), h.as("h"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("h") % mod) % mod).cast("long").as("sum_hash"),
        bit_xor(col("h")).as("xor_hash"))
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)
    assert(out.count() > 0)
    val versions = new java.io.File(s"$dir/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
  }

  test("incrementalUpsert's final state is independent of batch boundaries") {
    // keep-latest is idempotent+commutative across micro-batches: the
    // 4-batch replay, a 2-batch replay, and the single-batch replay must
    // all land on the identical latest-per-user table.
    val out4 = StreamOps.incrementalUpsert(spark, sf, "target/test_upsert4", 4)
    val out2 = StreamOps.incrementalUpsert(spark, sf, "target/test_upsert2", 2)
    val out1 = StreamOps.incrementalUpsert(spark, sf, "target/test_upsert1", 1)
    assert(out4.exceptAll(out2).isEmpty && out2.exceptAll(out4).isEmpty)
    assert(out4.exceptAll(out1).isEmpty && out1.exceptAll(out4).isEmpty)
    assert(out4.count() > 0)
    // one state row per user — the table is fully deduplicated
    assert(out4.count() == out4.select("user_id").distinct().count())
    // ≥2 versions on disk proves the merge path executed in the 4-batch run
    val versions = new java.io.File("target/test_upsert4/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
  }

  test("incrementalQuantiles matches the one-shot histogram quantiles") {
    val out = StreamOps.incrementalQuantiles(spark, sf, "target/test_quant")
    val direct = StreamOps.histogramQuantiles(
      Tables.load(spark, sf, "events")
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("bin"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt")))
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)
    assert(out.count() > 0)
    val versions = new java.io.File("target/test_quant/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
    // additive bins => the final state is independent of batch boundaries
    val out2 = StreamOps.incrementalQuantiles(spark, sf,
      "target/test_quant2", 2)
    assert(out2.exceptAll(out).isEmpty && out.exceptAll(out2).isEmpty)
  }

  test("incrementalExtremes / incrementalFirstSeen are batch-boundary-independent") {
    // assoc-comm merges (count/sum/min/max, struct-min) => final state
    // equals the whole-history recompute at ANY batch count
    val ex4 = StreamOps.incrementalExtremes(spark, sf, "target/test_ext4")
    val ex2 = StreamOps.incrementalExtremes(spark, sf, "target/test_ext2", 2)
    assert(ex4.exceptAll(ex2).isEmpty && ex2.exceptAll(ex4).isEmpty)
    val direct = Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("value") * 1000000L).cast("long")).cast("long")
          .as("sum6"),
        min(round(col("value") * 1000000L).cast("long")).as("min6"),
        max(round(col("value") * 1000000L).cast("long")).as("max6"))
    assert(ex4.exceptAll(direct).isEmpty && direct.exceptAll(ex4).isEmpty)
    val fs4 = StreamOps.incrementalFirstSeen(spark, sf, "target/test_fs4")
    val fs2 = StreamOps.incrementalFirstSeen(spark, sf, "target/test_fs2", 2)
    assert(fs4.exceptAll(fs2).isEmpty && fs2.exceptAll(fs4).isEmpty)
    // one row per user, and the merge path executed (≥2 state versions)
    assert(fs4.count() == fs4.select("user_id").distinct().count())
    val versions = new java.io.File("target/test_ext4/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
  }

  test("incrementalMoments is batch-boundary-independent and matches " +
      "the one-shot recompute") {
    // (n, Σv6, Σv6²) are plain sums => any batch split merges to the
    // same state; Σv6² rides DECIMAL(38) so squares cannot overflow
    val m4 = StreamOps.incrementalMoments(spark, sf, "target/test_mom4")
    val m2 = StreamOps.incrementalMoments(spark, sf, "target/test_mom2", 2)
    assert(m4.exceptAll(m2).isEmpty && m2.exceptAll(m4).isEmpty)
    val big38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val direct = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        round(col("value") * 1000000L).cast("long").as("v6"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v6")).cast("long").as("sum6"),
        sum(col("v6").cast(big38) * col("v6")).cast(big38).as("ssq"))
    assert(m4.exceptAll(direct).isEmpty && direct.exceptAll(m4).isEmpty)
    val versions = new java.io.File("target/test_mom4/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
  }

  test("incrementalPsi histogram is batch-boundary-independent and PSI " +
      "matches the one-shot recompute") {
    val p4 = StreamOps.incrementalPsi(spark, sf, "target/test_psi4")
    val p2 = StreamOps.incrementalPsi(spark, sf, "target/test_psi2", 2)
    assert(p4.exceptAll(p2).isEmpty && p2.exceptAll(p4).isEmpty)
    val direct = StreamOps.psiFromHistogram(
      Tables.load(spark, sf, "events")
        .select(col("event_type"),
          least(lit(15L), floor(col("value") / 10)).cast("long")
            .as("bucket"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("cnt")))
    assert(p4.exceptAll(direct).isEmpty && direct.exceptAll(p4).isEmpty)
    val versions = new java.io.File("target/test_psi4/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
  }

  test("incrementalKmv sketch is batch-boundary-independent and matches " +
      "the one-shot sketch") {
    // min-k of a union is associative+commutative => any batch split
    // merges to the same k-minima state
    val k4 = StreamOps.incrementalKmv(spark, sf, "target/test_kmv4")
    val k2 = StreamOps.incrementalKmv(spark, sf, "target/test_kmv2", 2)
    assert(k4.exceptAll(k2).isEmpty && k2.exceptAll(k4).isEmpty)
    val kmv = udaf(new graft.functions.KmvSketch(32),
      org.apache.spark.sql.Encoders.scalaLong)
    val direct = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("hv"))
      .groupBy("event_type").agg(kmv(col("hv")).as("mins"))
      .select(col("event_type"), explode(col("mins")).as("hv"))
    assert(k4.exceptAll(direct).isEmpty && direct.exceptAll(k4).isEmpty)
    val versions = new java.io.File("target/test_kmv4/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
  }

  test("incrementalDayCoverage is batch-boundary-independent and matches " +
      "the one-shot recompute") {
    val c4 = StreamOps.incrementalDayCoverage(spark, sf, "target/test_days4")
    val c2 = StreamOps.incrementalDayCoverage(spark, sf, "target/test_days2", 2)
    assert(c4.exceptAll(c2).isEmpty && c2.exceptAll(c4).isEmpty)
    val direct = StreamOps.dayCoverageFromState(
      Tables.tsAsTimestamp(Tables.load(spark, sf, "events")
          .withColumn("ts", col("ts")))
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("cnt")))
    assert(c4.exceptAll(direct).isEmpty && direct.exceptAll(c4).isEmpty)
    val versions = new java.io.File("target/test_days4/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
  }

  test("incrementalBloom: no false negatives, low FP, boundary-independent") {
    val b4 = StreamOps.incrementalBloom(spark, sf, "target/test_bloom4")
    val row = b4.head
    val nIds = row.getAs[Long]("n_ids")
    assert(nIds > 0)
    // OR-merge loses nothing: every ingested id must be present
    assert(row.getAs[Long]("n_present") == nIds)
    // 2^16 bits / ~1k ids keeps the false-positive rate well under 5%
    assert(row.getAs[Long]("n_false_positives") <
      math.max(1L, row.getAs[Long]("n_absent_probed") / 20))
    // bitwise OR is associative+commutative+idempotent => the filter (and
    // its summary) is identical at any batch count
    val b2 = StreamOps.incrementalBloom(spark, sf, "target/test_bloom2",
      nBatches = 2)
    assert(b4.exceptAll(b2).isEmpty && b2.exceptAll(b4).isEmpty)
  }

  test("replayEvents + watermark runs against the REAL events fixture") {
    // Round-6 regression guard: the fixture's ts encoding changed
    // (ns-as-Long → timestamp[us] NTZ) and withWatermark rejects NTZ, so
    // q_stream_late broke only in the driver's Verify run — this exercises
    // the exact q_stream_late path (file-source replay, watermark,
    // tumbling agg, AvailableNow) on the fixture, whatever its encoding.
    val streamed = StreamOps.tumblingCounts(
      StreamOps.replayEvents(spark, sf), "1 hour", "10 minutes")
    val out = StreamOps.runToCompletion(streamed) // Complete, as q_stream_late
    assert(out.count() > 0)
    // replay is a bounded in-order pass, so nothing is late: totals must
    // equal the batch recompute's row count over the same windows
    val batch = Tables.load(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
    assert(out.agg(sum("cnt")).head.getLong(0) ==
      batch.agg(sum("count")).head.getLong(0))
  }

  test("incrementalWatermark is batch-boundary-independent and matches " +
      "the batch watermark plan") {
    // event_id-range slices preserve the prefix property: an event's
    // "prior events" set is {event_id' < event_id} under any slice count
    val w4 = StreamOps.incrementalWatermark(spark, sf, "target/test_wm4")
    val w2 = StreamOps.incrementalWatermark(spark, sf, "target/test_wm2", 2)
    assert(w4.exceptAll(w2).isEmpty && w2.exceptAll(w4).isEmpty)
    val direct = graft.operators.PipelineQueries.qWatermarkPlan
      .run(spark, sf)
    assert(w4.exceptAll(direct).isEmpty && direct.exceptAll(w4).isEmpty)
    val versions = new java.io.File("target/test_wm4/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) >= 2)
  }

  test("incrementalSessions ledger is batch-boundary-independent and " +
      "matches the whole-history sessionization") {
    val s4 = StreamOps.incrementalSessions(spark, sf, "target/test_sess4")
    val s2 = StreamOps.incrementalSessions(spark, sf, "target/test_sess2", 2)
    assert(s4.exceptAll(s2).isEmpty && s2.exceptAll(s4).isEmpty)
    // one-shot: lag-gap sessionization over the full history
    val e = Tables.tsAsTimestamp(Tables.load(spark, sf, "events"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val direct = StreamOps.sessionRollup(
      e.withColumn("prev_us", lag(col("us"), 1).over(w))
        .groupBy("user_id")
        .agg(sum(when(col("prev_us").isNull
            || col("us") - col("prev_us") >= 1800L * 1000000L, 1L)
          .otherwise(0L)).as("n_sess")))
    assert(s4.exceptAll(direct).isEmpty && direct.exceptAll(s4).isEmpty)
  }

  test("incrementalGapStats ledger is batch-boundary-independent and " +
      "matches the whole-history lag recompute") {
    val g4 = StreamOps.incrementalGapStats(spark, sf, "target/test_gaps4")
    val g2 = StreamOps.incrementalGapStats(spark, sf, "target/test_gaps2", 2)
    val cols = Seq("event_type", "n", "n_gaps", "sum_gap", "max_gap")
    val v4 = g4.select(cols.map(col): _*)
    val v2 = g2.select(cols.map(col): _*)
    assert(v4.exceptAll(v2).isEmpty && v2.exceptAll(v4).isEmpty)
    // one-shot: lag-by-event_id gaps over the full history
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("event_id")
    val direct = Tables.tsAsTimestamp(Tables.load(spark, sf, "events"))
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("gap").isNotNull, 1L).otherwise(0L)).as("n_gaps"),
        coalesce(sum(col("gap")), lit(0L)).as("sum_gap"),
        max(col("gap")).as("max_gap"))
    assert(v4.exceptAll(direct).isEmpty && direct.exceptAll(v4).isEmpty)
  }

  test("incrementalGapStats keeps max_gap NULL for a single-event type " +
      "across batch boundaries (ADVICE r8: no Long.MinValue leak)") {
    // Planted fixture: type "solo" has ONE event (zero gaps — max_gap
    // must stay NULL in the ledger, exactly as the whole-history lag
    // recompute yields); type "multi" spans every batch so the merge
    // path with boundary gaps is exercised alongside it.
    import spark.implicits._
    val dir = "target/test_gaps_single"
    val rows = Seq((1L, "multi", 1000000000L), (2L, "solo", 2000000000L),
      (3L, "multi", 3000000000L), (4L, "multi", 5000000000L),
      (5L, "multi", 9000000000L))
    rows.toDF("event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/sf/events.parquet")
    val g = StreamOps.incrementalGapStats(spark, s"$dir/sf", s"$dir/w", 4)
    val solo = g.filter(col("event_type") === "solo")
      .select("n", "n_gaps", "max_gap").collect()
    assert(solo.length == 1)
    assert(solo(0).getLong(0) == 1L && solo(0).getLong(1) == 0L)
    assert(solo(0).isNullAt(2),
      s"single-event type must keep NULL max_gap, got ${solo(0).get(2)}")
    val multi = g.filter(col("event_type") === "multi")
      .select("n", "n_gaps", "max_gap").collect()(0)
    assert(multi.getLong(0) == 4L && multi.getLong(1) == 3L
      && multi.getLong(2) == 4000000L)
  }

  test("incrementalZAlarm ledger is batch-boundary-independent and " +
      "matches the whole-history prefix recompute") {
    val z4 = StreamOps.incrementalZAlarm(spark, sf, "target/test_zal4")
    val z2 = StreamOps.incrementalZAlarm(spark, sf, "target/test_zal2", 2)
    val cols = Seq("event_type", "n", "s", "q", "alarms")
    val v4 = z4.select(cols.map(col): _*)
    val v2 = z2.select(cols.map(col): _*)
    assert(v4.exceptAll(v2).isEmpty && v2.exceptAll(v4).isEmpty)
    // one-shot: prefix-window running moments + the integer 3σ predicate
    val big38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("event_id")
    val vb = col("v6").cast(big38)
    val pre = Tables.tsAsTimestamp(Tables.load(spark, sf, "events"))
      .select(col("event_id"), col("event_type"),
        round(col("value") * 1000000L).cast("long").as("v6"))
      .withColumn("np", row_number().over(w).cast("long") - 1L)
      .withColumn("sp",
        (sum(col("v6")).over(w).cast(big38) - vb).cast(big38))
      .withColumn("qp", (sum((vb * vb).cast(big38)).over(w)
        - (vb * vb).cast(big38)).cast(big38))
    val dev = (vb * col("np").cast(big38) - col("sp")).cast(big38)
    val alarm = col("np") >= 30L && (dev * dev).cast(big38) >
      (lit(9).cast(big38) * (col("np").cast(big38) * col("qp")
        - col("sp") * col("sp"))).cast(big38)
    val direct = pre.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum(col("v6")).as("s"),
      sum((vb * vb).cast(big38)).cast(big38).as("q"),
      sum(when(alarm, 1L).otherwise(0L)).as("alarms"))
    assert(v4.exceptAll(direct).isEmpty && direct.exceptAll(v4).isEmpty)
  }

  test("incrementalCusum state is batch-boundary-independent and matches " +
      "the whole-history closed form") {
    // the five-scalar segment merge is non-commutative; the event_id-range
    // prefix replay makes the fold exactly the whole-history recursion
    val c4 = StreamOps.incrementalCusum(spark, sf, "target/test_cus4")
    val c3 = StreamOps.incrementalCusum(spark, sf, "target/test_cus3", 3)
    assert(c4.exceptAll(c3).isEmpty && c3.exceptAll(c4).isEmpty)
    // one-shot: S_t = P_t − min(0, min_{j≤t} P_j) via per-type windows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("event_id")
    val stateView = c4.select(col("event_type"), col("n"), col("s"),
      col("minp"), col("maxp"), col("rawbest"), col("best"))
    val directBest = Tables.tsAsTimestamp(Tables.load(spark, sf, "events"))
      .select(col("event_id"), col("event_type"),
        (round(col("value") * 1000000L).cast("long") - 50000000L).as("d"))
      .withColumn("pre", sum(col("d")).over(w))
      .withColumn("runmin", min(col("pre")).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("d")).as("s"),
        min(col("pre")).as("minp"), max(col("pre")).as("maxp"),
        max(col("pre") - col("runmin")).as("rawbest"),
        max(col("pre") - least(lit(0L), col("runmin"))).as("best"))
    assert(stateView.exceptAll(directBest).isEmpty
      && directBest.exceptAll(stateView).isEmpty)
  }

  test("incrementalRegression co-moments are batch-boundary-independent " +
      "and match the one-shot recompute") {
    val r4 = StreamOps.incrementalRegression(spark, sf, "target/test_reg4")
    val r2 = StreamOps.incrementalRegression(spark, sf, "target/test_reg2", 2)
    assert(r4.exceptAll(r2).isEmpty && r2.exceptAll(r4).isEmpty)
    val big38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val direct = Tables.tsAsTimestamp(Tables.load(spark, sf, "events"))
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 1000000").as("x"),
        round(col("value") * 1000000L).cast("long").as("v6"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("v6")).cast("long").as("sv"),
        sum(col("x").cast(big38) * col("x")).cast(big38).as("sxx"),
        sum(col("x").cast(big38) * col("v6")).cast(big38).as("sxv"),
        sum(col("v6").cast(big38) * col("v6")).cast(big38).as("svv"))
    assert(r4.exceptAll(direct).isEmpty && direct.exceptAll(r4).isEmpty)
  }

  /** The sf1 streaming ladder leg (VERDICT r11 task 5), opt-in via
    * SPARK_GRAFT_STREAM_SF1=1 like PlanDriftSpec's big legs: replay the
    * three real incremental maintainers plus the state-store-backed
    * tumbling aggregation against the 1 M-event GenData fixture under
    * RocksDB, assert every final state equals its batch recompute (the
    * oracle semantics, now proven one decade past the driver's scale),
    * and report per-batch trigger latencies from the engine's own
    * StreamingQueryProgress plus the on-disk state size per maintainer. */
  test("sf1 streaming ladder leg: 1M-event replays under RocksDB match " +
      "their batch recomputes (opt-in)") {
    assume(sys.env.get("SPARK_GRAFT_STREAM_SF1").contains("1"),
      "set SPARK_GRAFT_STREAM_SF1=1 (and generate target/sf1) to run")
    val sf1 = "target/sf1"
    assume(new java.io.File(s"$sf1/events.parquet").exists,
      "target/sf1 not generated")
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val batches = collection.mutable.ArrayBuffer[(Long, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        batches.synchronized {
          batches += ((e.progress.batchId,
            Option(e.progress.durationMs.get("triggerExecution"))
              .map(_.longValue).getOrElse(-1L)))
        }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    def dirMb(p: String): Double = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) 0.0
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum / 1e6
        finally s.close()
      }
    }
    def stamp(name: String, stateDir: Option[String])(
        body: => org.apache.spark.sql.DataFrame)
        (oracle: => org.apache.spark.sql.DataFrame): Unit = {
      batches.synchronized(batches.clear())
      val t0 = System.nanoTime()
      val out = body.cache()
      val n = out.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val perBatch = batches.synchronized(
        batches.sortBy(_._1).map(_._2).mkString("[", ",", "]"))
      val state = stateDir.map(d => f"${dirMb(d)}%.1f MB state").getOrElse("")
      info(f"$name: $dt%.1f s, $n rows, per-batch trigger ms $perBatch $state")
      val want = oracle
      assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty,
        s"$name final state diverged from the batch recompute at sf1")
      out.unpersist(); ()
    }
    val work = java.nio.file.Files
      .createTempDirectory("stream_sf1_ladder").toString
    val ev = Tables.tsAsTimestamp(Tables.load(spark, sf1, "events"))
    spark.streams.addListener(listener)
    try underRocksDb {
      stamp("tumbling_counts(state-store)", None) {
        StreamOps.runToCompletion(StreamOps.tumblingCounts(
          StreamOps.replayEvents(spark, sf1), "1 hour", "10 minutes"))
          .select(col("window_start"), col("event_type"), col("cnt"))
      } {
        ev.groupBy(window(col("ts"), "1 hour").getField("start")
            .as("window_start"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
      }
      stamp("incr_daily_counts", Some(s"$work/incr")) {
        StreamOps.incrementalDailyCounts(spark, sf1, s"$work/incr")
      } {
        ev.groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
      }
      stamp("incr_checksum", Some(s"$work/cksum")) {
        StreamOps.incrementalChecksum(spark, sf1, s"$work/cksum")
      } {
        val mod = 1099511627776L
        ev.select(col("event_type"),
            conv(substring(md5(concat_ws("|", col("event_id"),
              col("user_id"), col("event_type"), unix_micros(col("ts")))),
              1, 15), 16, 10).cast("long").as("h"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            (sum(col("h") % mod) % mod).cast("long").as("sum_hash"),
            bit_xor(col("h")).as("xor_hash"))
      }
      stamp("incr_upsert", Some(s"$work/upsert")) {
        StreamOps.incrementalUpsert(spark, sf1, s"$work/upsert")
      } {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(col("us").desc, col("event_id").desc)
        ev.select(col("user_id"), col("event_type").as("state"),
            unix_micros(col("ts")).as("us"), col("event_id"))
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") === 1)
          .select("user_id", "state", "us")
      }
    } finally spark.streams.removeListener(listener)
  }
}
