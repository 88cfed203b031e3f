package graft

import graft.operators.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Semantics of the analytics/warehouse family beyond the DuckDB oracle:
  * merge == recompute, PageRank invariants (and a closed-form graph),
  * bucket balance, brute-force cross-checks for the rolling median, the
  * diversity moments, the z-test, and the blocked fuzzy join. */
class AnalyticsSpec extends SparkTestBase {

  test("q_merge_upsert equals the direct latest-per-user recompute") {
    val merged = AnalyticsQueries.qMergeUpsert.run(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
    val direct = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("state"), col("us"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
    assert(merged.count() > 0)
  }

  test("PageRank.iterate on a 2-node cycle stays uniform at every iteration") {
    val nodes = spark.range(2).toDF("id")
    val edges = spark.createDataFrame(Seq((0L, 1L, 1.0), (1L, 0L, 1.0)))
      .toDF("src", "dst", "w")
    val ranks = plans.PageRank.iterate(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // symmetric cycle ⇒ the uniform distribution is the fixed point
    assert(math.abs(ranks(0L) - 0.5) < 1e-12)
    assert(math.abs(ranks(1L) - 0.5) < 1e-12)
  }

  test("q_pagerank ranks are a (sub-)distribution above the teleport floor") {
    val out = AnalyticsQueries.qPagerank.run(spark, sf).cache()
    val n = Tables.load(spark, sf, "nation").count().toDouble
    val ranks = out.collect().map(_.getDouble(1))
    assert(ranks.length == n.toInt)
    // every node keeps at least the teleport mass
    assert(ranks.forall(_ >= 0.15 / n - 1e-9))
    // dangling simplification only DECAYS mass: sum in (0, 1]
    val total = ranks.sum
    assert(total > 0.5 && total <= 1.0 + 1e-6)
    out.unpersist()
  }

  test("q_quantile_buckets partitions all orders into 4 nonempty buckets") {
    val out = AnalyticsQueries.qQuantileBuckets.run(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val total = Tables.load(spark, sf, "orders").count()
    assert(out.map(_.getLong(1)).sum == total)
    // exact quartile cuts ⇒ roughly balanced buckets
    assert(out.forall(r => r.getLong(1) > total / 8))
  }

  test("q_rolling_median matches a brute-force 7-row frame median") {
    val rows = AnalyticsQueries.qRollingMedian.run(spark, sf).collect()
    val byUser = Tables.load(spark, sf, "events")
      .filter(col("user_id") % 25 === 0)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(t => (t._3, t._2))).toMap
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (user, eid, med) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      val seq = byUser(user)
      val i = seq.indexWhere(_._2 == eid)
      val frame = seq.slice(math.max(0, i - 6), i + 1).map(_._4)
      assert(math.abs(med - BigDecimal(median(frame))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"user=$user event=$eid")
    }
  }

  test("q_source_diversity moments match a brute-force recount") {
    val out = AnalyticsQueries.qSourceDiversity.run(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
    out.foreach { r =>
      val (src, n, v) = (r.getString(0), r.getLong(1), r.getLong(2))
      val terms = docs.filter(_.getString(0) == src)
        .flatMap(_.getString(1).split(" ", -1))
      val hist = terms.groupBy(identity).view.mapValues(_.length.toLong)
      assert(n == terms.length, s"n_tokens $src")
      assert(v == hist.size, s"n_terms $src")
      val s2 = hist.values.map(c => c * c).sum
      val simpson = 1 - s2.toDouble / (n.toDouble * n.toDouble)
      assert(math.abs(r.getDouble(3) - simpson) < 1e-6, s"simpson $src")
    }
  }

  test("q_abtest_ztest z-score matches a hand recompute per segment") {
    val out = AnalyticsQueries.qAbtestZtest.run(spark, sf).collect()
    assert(out.length >= 2)
    val tn = out.map(_.getLong(1)).sum
    val tx = out.map(_.getLong(2)).sum
    out.foreach { r =>
      val (n, x, z) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      val p1 = x.toDouble / n
      val p2 = (tx - x).toDouble / (tn - n)
      val pp = tx.toDouble / tn
      val zz = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n + 1.0 / (tn - n)))
      assert(math.abs(z - zz) < 1e-6, s"segment=${r.getString(0)}")
    }
  }

  test("q_fuzzy_join equals the brute-force blocked edit-distance pairs") {
    val got = AnalyticsQueries.qFuzzyJoin.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val parts = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_brand", "p_size", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- parts; b <- parts
      if a._1 < b._1 && a._2 == b._2 && a._3 % 10 == b._3 % 10
      dist = lev(a._4, b._4) if dist <= 3
    } yield (a._1, b._1, dist)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("fuzzy blocking at k>=1: catches middle edits, provably drops the " +
      "both-ends miss class (the documented recall bound)") {
    val spark2 = spark
    import spark2.implicits._
    val parts = Seq(
      // middle-edit pair: prefix 'a' and suffix 'z' agree -> caught
      (1L, "Brand#11", 3, "aqua Xolt z"),
      (2L, "Brand#11", 3, "aqua Yolt z"),
      // both-ends pair: distance 2 (<=3) but first AND last char edited
      // -> neither the prefix-1 nor the suffix-1 pass can block it
      (3L, "Brand#11", 3, "aqua bolt x"),
      (4L, "Brand#11", 3, "zqua bolt z"),
      // control far pair in the same block
      (5L, "Brand#11", 3, "chartreuse sprocket q")
    ).toDF("p_partkey", "p_brand", "p_size", "p_name")
    val got = operators.AnalyticsQueries.fuzzyBlockedPairs(parts, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), "middle-edit pair must be caught")
    assert(!got.contains((3L, 4L)),
      "the both-ends pair is the DOCUMENTED miss class — if a third " +
        "pass ever closes it, update the recall-bound Scaladoc and SCALE.md")
    // sanity: dist(3,4) really is within the radius, so the miss is the
    // blocking's doing, not the distance filter's
    val d34 = parts.as("a").crossJoin(parts.as("b"))
      .filter($"a.p_partkey" === 3 && $"b.p_partkey" === 4)
      .select(levenshtein($"a.p_name", $"b.p_name")).head().getInt(0)
    assert(d34 <= 3, s"planted pair distance $d34")
    // and at k = 0 (every oracle scale) the same pair IS found: k = 0 is
    // exact blocking by construction
    val k0 = operators.AnalyticsQueries.fuzzyBlockedPairs(parts, k = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k0.contains((3L, 4L)) && k0.contains((1L, 2L)))
  }

  test("q_ks_test equals the brute-force two-sample KS statistic") {
    val row = AnalyticsQueries.qKsTest.run(spark, sf).collect().head
    val ev = Tables.load(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val g1 = ev.filter(_._1 == "purchase").map(_._2).sorted
    val g2 = ev.filter(_._1 == "view").map(_._2).sorted
    val points = (g1 ++ g2).distinct.sorted
    val d = points.map { v =>
      math.abs(g1.count(_ <= v).toDouble / g1.length
        - g2.count(_ <= v).toDouble / g2.length)
    }.max
    assert(row.getLong(1) == g1.length && row.getLong(2) == g2.length)
    assert(math.abs(row.getDouble(0) - d) < 1e-6)
  }

  test("q_time_weighted_avg matches a brute-force gap-weighted mean") {
    val out = AnalyticsQueries.qTimeWeightedAvg.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val byUser = Tables.load(spark, sf, "events")
      .filter(col("user_id") % 20 === 0)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(out.nonEmpty)
    byUser.foreach { case (user, rows) =>
      val seq = rows.sortBy(t => (t._3, t._2))
      if (seq.length >= 2) {
        val segs = seq.sliding(2).map { case Array(a, b) =>
          (a._4, b._3 - a._3)
        }.toSeq
        val twap = segs.map { case (v, dt) => v * dt }.sum /
          segs.map(_._2).sum.toDouble
        val (n, got) = out(user)
        assert(n == segs.length, s"user=$user")
        assert(math.abs(got - twap) < 1e-5, s"user=$user")
      }
    }
  }

  test("q_weighted_sample keeps exactly the hash-under-weight documents") {
    val kept = AnalyticsQueries.qWeightedSample.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = Tables.load(spark, sf, "documents")
      .select(col("source"), col("n_chars"),
        llm.TextOps.hash60(col("text")).as("h"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter { case (_, nc, h) =>
        (h % 1000000L) < math.min(1000000L, nc * 2000L) }
      .groupBy(_._1)
      .view.mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    assert(kept == want)
    assert(kept.values.map(_._1).sum > 0)
  }

  test("q_window_cumdistinct is the running count of first-seen types") {
    val out = AnalyticsQueries.qWindowCumdistinct.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val byUser = Tables.load(spark, sf, "events")
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    assert(out.nonEmpty)
    byUser.foreach { case (user, rows) =>
      val seen = scala.collection.mutable.Set[String]()
      rows.sortBy(t => (t._4, t._2)).foreach { e =>
        seen += e._3
        assert(out((user, e._2)) == seen.size.toLong,
          s"user=$user event=${e._2}")
      }
    }
  }

  test("q_stream_interval_join counts match a brute-force window scan") {
    val out = operators.StreamingQueries.qStreamIntervalJoin.run(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    val ev = Tables.load(spark, sf, "events")
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = ev.filter(_._3 == "view")
    val clicks = ev.filter(_._3 == "click")
    assert(views.nonEmpty && out.size == views.length)
    views.foreach { v =>
      val n = clicks.count(c =>
        c._1 == v._1 && c._4 >= v._4 && c._4 < v._4 + 600000000L)
      assert(out(v._2) == n.toLong, s"view=${v._2}")
    }
  }

  test("LabelProp.run converges to GraphX connected components") {
    // the registered query's own graph: sparsified part co-occurrence
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
      .filter(conv(substring(md5(concat(col("src").cast("string"),
        lit("_"), col("dst").cast("string"))), 1, 15), 16, 10)
        .cast("long") % 20 === 0)
      .cache()
    val lp = plans.LabelProp.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gx = llm.Dedup.nearDupClusters(
        edges.select(col("src").as("doc_a"), col("dst").as("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    edges.unpersist()
    assert(lp.nonEmpty && lp.keySet == gx.keySet)
    // same partition of the vertex set: equal labels ⟺ equal components
    lp.keys.foreach { v =>
      lp.keys.foreach { u =>
        assert((lp(v) == lp(u)) == (gx(v) == gx(u)), s"pair ($v,$u)")
      }
    }
    // min-label invariant: every component is labeled by its min vertex
    lp.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl)
    }
  }

  test("LabelProp.iterate pre-convergence state is the k-hop min") {
    // path 1-2-3-4-5 plus isolated edge 10-11
    val edges = spark.createDataFrame(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)))
      .toDF("src", "dst")
    val one = plans.LabelProp.iterate(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after one sweep each vertex holds the min id within one hop
    assert(one == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      10L -> 10L, 11L -> 10L))
    val conv = plans.LabelProp.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("q_interval_overlap equals a brute-force concurrency scan") {
    val Array(row) = AnalyticsQueries.qIntervalOverlap.run(spark, sf).collect()
    val (mx, at) = (row.getLong(0), row.getLong(1))
    val starts = Tables.load(spark, sf, "events")
      .select(unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(_.getLong(0))
    // concurrency just after each boundary instant, intervals [s, s+30m)
    val bounds = (starts ++ starts.map(_ + 1800000000L)).distinct.sorted
    val conc = bounds.map(t =>
      t -> starts.count(s => s <= t && t < s + 1800000000L))
    assert(conc.map(_._2).max == mx)
    assert(conc.filter(_._2 == mx).map(_._1).min == at)
  }

  test("q_snapshot_diff statuses are consistent and slices add up") {
    val rows = AnalyticsQueries.qSnapshotDiff.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val cut = 1705363200000000L // 2024-01-16 00:00:00 UTC in µs
    val ev = Tables.load(spark, sf, "events")
      .select(unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(_.getLong(0))
    assert(rows.map(_.getLong(2)).sum == ev.count(_ < cut))
    assert(rows.map(_.getLong(3)).sum == ev.count(_ >= cut))
    rows.foreach { r =>
      val (a, b, st) = (r.getLong(2), r.getLong(3), r.getString(4))
      st match {
        case "added"   => assert(a == 0 && b > 0)
        case "removed" => assert(a > 0 && b == 0)
        case "same"    => assert(a == b && a > 0)
        case "changed" => assert(a > 0 && b > 0 && a != b)
      }
    }
  }

  test("q_chi2_drift terms are nonnegative and keys cover observed types") {
    val rows = AnalyticsQueries.qChi2Drift.run(spark, sf).collect()
    val types = Tables.load(spark, sf, "events")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet == types)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }
}
