package graft.operators

import graft.Q
import graft.Dsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** §2.E window functions.
  *
  * Every window partitions by a key (customer/user/brand) — at 100 TB the
  * partitionBy column is the shuffle key and per-key data must fit a task;
  * all keys here are high-cardinality-safe choices. Window ORDER BYs carry
  * a unique tiebreak column so rank/lag assignments are total, not
  * tie-dependent (cross-engine hash-match requirement).
  */
object Windows {

  val qWindowRank = Q(
    "q_window_rank",
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  CAST(rank() OVER w AS INT) AS rnk,
      |  CAST(dense_rank() OVER w AS INT) AS drnk,
      |  CAST(row_number() OVER w AS INT) AS rn
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderpriority, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .orderBy("o_orderpriority", "rn")
  }

  /** Running decimal sum — exact, so the cumulative value is reduction-
    * order-independent (same reason partial aggs stay exact at scale). */
  val qWindowRunning = Q(
    "q_window_running",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |  AS DOUBLE) AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        asDbl(sum(dec2(col("o_totalprice"))).over(w)).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Integer microsecond gaps — no truncation/boundary-count ambiguity. */
  val qWindowLeadLag = Q(
    "q_window_lead_lag",
    """SELECT user_id, event_id,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
      |  lead(epoch_us(ts)) OVER w - epoch_us(ts) AS next_gap_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val us = unix_micros(col("ts").cast(TimestampType))
    t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        (us - lag(us, 1).over(w)).as("gap_us"),
        (lead(us, 1).over(w) - us).as("next_gap_us"))
      .orderBy("user_id", "event_id")
  }

  /** 10-minute trailing mean via RANGE frame over epoch seconds. */
  val qWindowRangeFrame = Q(
    "q_window_range_frame",
    """SELECT user_id, event_id,
      |  ROUND(avg(value) OVER (
      |    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 6) AS trailing_avg
      |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").cast(TimestampType).cast(LongType))
      .rangeBetween(-600, Window.currentRow)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        round(avg(col("value")).over(w), 6).as("trailing_avg"))
      .orderBy("user_id", "event_id")
  }

  /** Global ntile/percent_rank WITHOUT a global window: two-pass
    * range-partitioned rank (graft.plans.GlobalRank) — per-partition row
    * numbers shifted by constant-size partition-count offsets, then the
    * ntile/percent_rank arithmetic applied to the global rank. Scales to
    * any row count; the old single-task `Window.orderBy` does not. */
  val qWindowNtile = Q(
    "q_window_ntile",
    """SELECT c_custkey,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  ROUND(percent_rank() OVER w, 6) AS pct_rank
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val (ranked, n) = graft.plans.GlobalRank.withGlobalRowNumber(
      t(s, d, "customer").select("c_custkey", "c_acctbal"),
      "g_rank", 32, col("c_acctbal"), col("c_custkey"))
    ranked.select(col("c_custkey"),
      graft.plans.GlobalRank.ntileFromRank(col("g_rank"), n, 4)
        .cast(IntegerType).as("quartile"),
      round(graft.plans.GlobalRank.percentRankFromRank(col("g_rank"), n), 6)
        .as("pct_rank"))
      .orderBy("c_custkey")
  }

  /** Top-k per group: the scalable pattern (window + filter, no global
    * sort or collect — one shuffle on the group key). */
  val qTopkPerGroup = Q(
    "q_topk_per_group",
    """SELECT p_brand, p_partkey, revenue, CAST(rn AS INT) AS rn FROM (
      |  SELECT p_brand, p_partkey, revenue,
      |    row_number() OVER (PARTITION BY p_brand
      |                       ORDER BY revenue DESC, p_partkey) AS rn
      |  FROM (SELECT p_brand, p_partkey,
      |          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                   (1 - CAST(l_discount AS DECIMAL(18,2))))
      |               AS DOUBLE) AS revenue
      |        FROM lineitem JOIN part ON l_partkey = p_partkey
      |        GROUP BY p_brand, p_partkey) r) q
      |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin) { (s, d) =>
    val rev = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(asDbl(sum(dec2(col("l_extendedprice")) *
        (lit(1) - dec2(col("l_discount"))))).as("revenue"))
    val w = Window.partitionBy("p_brand")
      .orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "revenue", "rn")
      .orderBy("p_brand", "rn")
  }

  /** Full-frame value windows: first/last/nth over the whole partition
    * (frame pinned to UNBOUNDED..UNBOUNDED — last_value's default frame
    * ends at CURRENT ROW and is a classic cross-engine trap). */
  val qWindowFirstLast = Q(
    "q_window_first_last",
    """SELECT o_orderkey, o_orderpriority,
      |  first_value(o_orderkey) OVER w AS top_key,
      |  last_value(o_orderkey) OVER w AS bottom_key,
      |  nth_value(o_orderkey, 2) OVER w AS second_key,
      |  ROUND(cume_dist() OVER
      |    (PARTITION BY o_orderpriority
      |     ORDER BY o_totalprice DESC, o_orderkey), 6) AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING
      |               AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin) { (s, d) =>
    val ord = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        first(col("o_orderkey")).over(w).as("top_key"),
        last(col("o_orderkey")).over(w).as("bottom_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
        round(cume_dist().over(ord), 6).as("cd"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Batch sessionization: gap > 8 h starts a new session (the batch
    * analog of q_stream_session). Classic two-window pattern — lag to
    * flag session starts, running sum to number them — both windows
    * partitioned by user, so it scales per-user, never globally. Gaps
    * compare in integer microseconds (no truncation ambiguity); the
    * HUGEINT running sum is cast to BIGINT on the DuckDB side. */
  val qSessionizeBatch = Q(
    "q_sessionize_batch",
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
      |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
      |              > 28800000000 THEN 1
      |         ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |s AS (
      |  SELECT user_id, us,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM g)
      |SELECT user_id, CAST(sess AS BIGINT) AS session_id,
      |  count(*) AS n_events, max(us) - min(us) AS dur_us
      |FROM s GROUP BY user_id, sess
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val us = unix_micros(col("ts").cast(TimestampType))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), us.as("us"))
      .withColumn("is_new",
        when(lag(col("us"), 1).over(w).isNull, 1)
          .when(col("us") - lag(col("us"), 1).over(w) > 28800000000L, 1)
          .otherwise(0))
      .withColumn("sess", sum(col("is_new")).over(run))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
      .select(col("user_id"), col("sess").as("session_id"),
        col("n_events"), col("dur_us"))
      .orderBy("user_id", "session_id")
  }

  /** Ordered funnel (view → click → purchase): each stage is the min
    * event time strictly after the previous stage's time. Three
    * user-keyed aggregations + two user-keyed joins — everything
    * co-partitions on user_id, so the funnel costs one shuffle key at
    * any scale. Times compare in integer microseconds. */
  val qFunnelStages = Q(
    "q_funnel_stages",
    """WITH v AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
      |  GROUP BY e.user_id)
      |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin) { (s, d) =>
    val us = unix_micros(col("ts").cast(TimestampType))
    val ev = t(s, d, "events")
      .select(col("user_id"), col("event_type"), us.as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t_view"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v.as("v"), col("e.user_id") === col("v.user_id"))
      .filter(col("e.us") > col("v.t_view"))
      .groupBy(col("e.user_id").as("user_id"))
      .agg(min(col("e.us")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").as("e")
      .join(c.as("c"), col("e.user_id") === col("c.user_id"))
      .filter(col("e.us") > col("c.t_click"))
      .groupBy(col("e.user_id").as("user_id"))
      .agg(min(col("e.us")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select("user_id", "t_view", "t_click", "t_purchase")
      .orderBy("user_id")
  }

  /** CDC-style latest-snapshot compaction: keep each user's most recent
    * event (ties on identical timestamps break by highest event_id).
    * Same single-shuffle window+filter shape as top-k per group — the
    * pattern that compacts a 100 TB changelog to current state. */
  val qLatestSnapshot = Q(
    "q_latest_snapshot",
    """SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM (
      |  SELECT user_id, event_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) x
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast(TimestampType)).as("us"))
      .orderBy("user_id")
  }

  // 8-term exponential-decay weights 2^-j: every weight is a power of two,
  // so each product is an exact exponent shift and the unrolled left-to-
  // right sum associates identically in both engines — bit-stable without
  // any recursive window state.
  private val decayTerms = 0 until 8

  /** Time-decayed trailing engagement score: Σ_{j<8} value[t−j] · 2^−j
    * over each user's event sequence (missing history counts 0). The
    * unrolled-lag form needs no UDF and no recursive state — it stays
    * inside one per-user window pass under whole-stage codegen. */
  val qDecayAvg = Q(
    "q_decay_avg",
    s"""SELECT user_id, event_id, ${decayTerms.map {
         case 0 => "value"
         case j => s"coalesce(lag(value, $j) OVER w, 0) / ${1L << j}"
       }.mkString(" + ")} AS decayed
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
       |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val us = unix_micros(col("ts").cast(TimestampType))
    val w = Window.partitionBy("user_id").orderBy(us, col("event_id"))
    val score = decayTerms.map {
      case 0 => col("value")
      case j => coalesce(lag(col("value"), j).over(w), lit(0)) / (1L << j)
    }.reduceLeft(_ + _)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), score.as("decayed"))
      .orderBy("user_id", "event_id")
  }

  /** Winsorized statistics: clip values to the exact rank-defined
    * [p01, p99] before aggregating (robust to sensor spikes/outliers).
    * The thresholds come from graft.plans.GlobalRank — the two-pass
    * range-partitioned rank — NOT a global window, so the exact-quantile
    * lookup stays distributed at any scale; the two threshold rows are a
    * broadcast. Rank-based quantiles (value at ceil(q·n)) avoid cross-
    * engine interpolation semantics entirely. */
  val qWinsorize = Q(
    "q_winsorize",
    """WITH ranked AS (
      |  SELECT value, event_type,
      |    row_number() OVER (ORDER BY value, event_id) AS r,
      |    count(*) OVER () AS n
      |  FROM events),
      |cuts AS (
      |  SELECT
      |    max(CASE WHEN r = CAST(ceil(0.01 * n) AS BIGINT)
      |        THEN value END) AS lo,
      |    max(CASE WHEN r = CAST(ceil(0.99 * n) AS BIGINT)
      |        THEN value END) AS hi
      |  FROM ranked)
      |SELECT event_type, count(*) AS n_events,
      |  ROUND(avg(least(greatest(value, lo), hi)), 6) AS clipped_avg,
      |  lo AS clip_lo, hi AS clip_hi
      |FROM events, cuts
      |GROUP BY event_type, lo, hi ORDER BY event_type""".stripMargin) {
    (s, d) =>
    val ev = t(s, d, "events")
    val (ranked, n) = graft.plans.GlobalRank.withGlobalRowNumber(
      ev.select("event_id", "value"), "r", 32, col("value"), col("event_id"))
    val loRank = math.ceil(0.01 * n).toLong
    val hiRank = math.ceil(0.99 * n).toLong
    val cuts = ranked.filter(col("r") === loRank || col("r") === hiRank)
      .agg(max(when(col("r") === loRank, col("value"))).as("lo"),
        max(when(col("r") === hiRank, col("value"))).as("hi"))
    ev.crossJoin(broadcast(cuts))
      .groupBy("event_type", "lo", "hi")
      .agg(count(lit(1)).as("n_events"),
        round(avg(least(greatest(col("value"), col("lo")), col("hi"))), 6)
          .as("clipped_avg"))
      .select(col("event_type"), col("n_events"), col("clipped_avg"),
        col("lo").as("clip_lo"), col("hi").as("clip_hi"))
      .orderBy("event_type")
  }

  /** Weekly cohort retention: cohort = each user's first active week
    * (integer µs floor-division — no calendar/locale semantics to drift
    * cross-engine), cell = distinct users from that cohort active at
    * each week offset. Two user-keyed aggs + one broadcast-size join. */
  val qCohortRetention = Q(
    "q_cohort_retention",
    """WITH wk AS (
      |  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
      |cohort AS (
      |  SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
      |SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
      |  count(DISTINCT w.user_id) AS n_users
      |FROM wk w JOIN cohort c ON w.user_id = c.user_id
      |GROUP BY c.cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
    val wk = t(s, d, "events")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 604800000000")
          .as("week"))
    val cohort = wk.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    wk.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week"))
        .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Group-mean null imputation: nulls are planted deterministically
    * (error events lose their value — the realistic telemetry case), then
    * filled with the user's mean of observed values. One per-user window
    * over the observed subset — no second scan, no join. */
  val qImputeNulls = Q(
    "q_impute_nulls",
    """SELECT user_id, event_id,
      |  ROUND(coalesce(v, avg(v) OVER (PARTITION BY user_id), 0), 6)
      |    AS v_filled,
      |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_null
      |FROM (SELECT user_id, event_id,
      |        CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |      FROM events) e
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
    t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        when(col("event_type") === "error", lit(null)).otherwise(col("value"))
          .as("v"))
      .select(col("user_id"), col("event_id"),
        round(coalesce(col("v"), avg(col("v")).over(w), lit(0)), 6)
          .as("v_filled"),
        when(col("v").isNull, 1).otherwise(0).as("was_null"))
      .orderBy("user_id", "event_id")
  }

  /** Per-user min-max feature scaling to [0, 1] — the normalization
    * staple. min/max are exact; the single division happens identically
    * in both engines (round 6); constant-valued users scale to 0. */
  val qMinmaxScale = Q(
    "q_minmax_scale",
    """SELECT user_id, event_id,
      |  ROUND(CASE WHEN mx = mn THEN 0
      |        ELSE (value - mn) / (mx - mn) END, 6) AS scaled
      |FROM (SELECT user_id, event_id, value,
      |        min(value) OVER (PARTITION BY user_id) AS mn,
      |        max(value) OVER (PARTITION BY user_id) AS mx
      |      FROM events) e
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        min(col("value")).over(w).as("mn"),
        max(col("value")).over(w).as("mx"))
      .select(col("user_id"), col("event_id"),
        round(when(col("mx") === col("mn"), 0)
          .otherwise((col("value") - col("mn")) / (col("mx") - col("mn"))), 6)
          .as("scaled"))
      .orderBy("user_id", "event_id")
  }

  /** Distribution-position functions (percent_rank / cume_dist): the
    * remaining rank-family members. Both are one exact count/rank
    * division — cross-engine-identical — rounded 6 anyway; the window
    * partitions by segment like every other window here. */
  val qWindowCume = Q(
    "q_window_cume",
    """SELECT c_mktsegment, c_custkey,
      |  ROUND(percent_rank() OVER w, 6) AS pr,
      |  ROUND(cume_dist() OVER w, 6) AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment
      |             ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, d, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Forward-fill (LOCF) imputation: the time-series counterpart of
    * q_impute_nulls' group-mean fill — each missing value takes the LAST
    * observed value in that user's event-time order (the standard sensor/
    * telemetry gap treatment; no look-ahead leakage by construction).
    * Same deterministic null-planting convention as q_impute_nulls (error
    * events lose their value). Pure selection — no floating-point
    * accumulation at all — over one user-keyed ordered window with a
    * unique (us, event_id) tiebreak. */
  val qLocfImpute = Q(
    "q_locf_impute",
    """SELECT user_id, event_id,
      |  ROUND(last_value(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled,
      |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_null
      |FROM (SELECT user_id, event_id, ts,
      |        CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |      FROM events) e
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts").cast(TimestampType)), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "error", lit(null)).otherwise(col("value"))
          .as("v"))
      .select(col("user_id"), col("event_id"),
        round(last(col("v"), ignoreNulls = true).over(w), 6).as("v_filled"),
        when(col("v").isNull, 1).otherwise(0).as("was_null"))
      .orderBy("user_id", "event_id")
  }

  /** Robust (median/IQR) feature scaling — the outlier-insensitive
    * companion to q_minmax_scale: scaled = (x − median)/IQR with the
    * per-user cuts computed exactly, rounded 6, and broadcast back (the
    * q_quantile_buckets idiom), so both engines scale against identical
    * constants. Constant-valued users (IQR 0) scale to 0. Per-user cut
    * table is |users|-bounded — broadcast side; the fact scan stays one
    * pass. Exact-percentile adjudication (no ApproxGate): each group
    * buffers ONE user's event history, which stays O(1) as users scale —
    * the data-sized dimension here is the NUMBER of groups, which a
    * grouped aggregate distributes; only a pathological single-user
    * history would need the sketch. */
  val qRobustScale = Q(
    "q_robust_scale",
    """WITH cuts AS (
      |  SELECT user_id AS cu,
      |    ROUND(quantile_cont(value, 0.50), 6) AS med,
      |    ROUND(quantile_cont(value, 0.75)
      |      - quantile_cont(value, 0.25), 6) AS iqr
      |  FROM events GROUP BY 1)
      |SELECT user_id, event_id,
      |  ROUND(CASE WHEN iqr = 0 THEN 0 ELSE (value - med) / iqr END, 6)
      |    AS scaled
      |FROM events JOIN cuts ON user_id = cu
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val events = t(s, d, "events")
    val cuts = events.groupBy(col("user_id").as("cu"))
      .agg(round(expr("percentile(value, 0.50)"), 6).as("med"),
        round(expr("percentile(value, 0.75) - percentile(value, 0.25)"), 6)
          .as("iqr"))
    events.join(broadcast(cuts), col("user_id") === col("cu"))
      .select(col("user_id"), col("event_id"),
        round(when(col("iqr") === 0, 0)
          .otherwise((col("value") - col("med")) / col("iqr")), 6)
          .as("scaled"))
      .orderBy("user_id", "event_id")
  }

  /** Corpus-level session rollup over q_sessionize_batch's 30-minute
    * gaps-and-islands sessions: session count, events-per-session, mean
    * duration, and bounce rate (single-event sessions) — the engagement
    * summary a product dashboard reads daily. Every mean is an exact
    * integer ratio (counts and µs sums) with one final double division;
    * windows are user-keyed only. */
  val qSessionStats = Q(
    "q_session_stats",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |x AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN lag(us) OVER (PARTITION BY user_id
      |        ORDER BY us, event_id) IS NULL
      |      OR us - lag(us) OVER (PARTITION BY user_id
      |        ORDER BY us, event_id) > 1800000000
      |      THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |sd AS (
      |  SELECT user_id, us,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM x),
      |g AS (
      |  SELECT user_id, sid, count(*) AS n_events,
      |    max(us) - min(us) AS dur_us
      |  FROM sd GROUP BY 1, 2)
      |SELECT count(*) AS n_sessions,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  ROUND(CAST(sum(n_events) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
      |    AS mean_events,
      |  ROUND(CAST(sum(dur_us) AS DOUBLE) / 1000000
      |    / CAST(count(*) AS DOUBLE), 6) AS mean_duration_s,
      |  ROUND(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
      |FROM g""".stripMargin) { (s, d) =>
    val e = t(s, d, "events").select(col("user_id"), col("event_id"),
      unix_micros(col("ts").cast(TimestampType)).as("us"))
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = e.withColumn("brk",
      when(lag(col("us"), 1).over(wOrd).isNull ||
        col("us") - lag(col("us"), 1).over(wOrd) > 1800000000L, 1)
        .otherwise(0))
    val g = x.withColumn("sid", sum(col("brk")).over(wRun))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
    g.agg(count(lit(1)).as("n_sessions"),
      countDistinct(col("user_id")).as("n_users"),
      round(sum(col("n_events")).cast(DoubleType)
        / count(lit(1)).cast(DoubleType), 6).as("mean_events"),
      round(sum(col("dur_us")).cast(DoubleType) / 1000000
        / count(lit(1)).cast(DoubleType), 6).as("mean_duration_s"),
      round(sum(when(col("n_events") === 1, 1).otherwise(0))
        .cast(DoubleType) / count(lit(1)).cast(DoubleType), 6)
        .as("bounce_rate"))
  }

  val all: Seq[Q] = Seq(
    qWindowRank, qWindowRunning, qWindowLeadLag, qWindowRangeFrame,
    qWindowNtile, qWindowFirstLast, qWindowCume, qTopkPerGroup,
    qSessionizeBatch, qFunnelStages, qLatestSnapshot, qDecayAvg, qWinsorize,
    qCohortRetention, qImputeNulls, qMinmaxScale, qLocfImpute, qRobustScale,
    qSessionStats)
}
