package graft.operators

import graft.Q
import graft.Dsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution-shape and paired-sample statistics (round-7 continuation):
  * Jarque–Bera normality, Brown–Forsythe variance homogeneity, Wilson
  * binomial intervals, McNemar's paired test, and per-group trimmed means.
  *
  * Same determinism contract as the rest of the registry: raw moment sums
  * stay exact (DECIMAL(38) / HUGEINT) at any merge order; doubles appear
  * only in final per-row expressions written with IDENTICAL operation
  * order on both engines; cross-group assemblies follow the q_anova
  * round-to-integer-before-summing idiom so no double is ever aggregated.
  */
object StatQueries {

  private val big38 = DecimalType(38, 0)

  /** Orders joined to their customer's nation — the shared stats
    * stratification. Both dims broadcast (25 / 1.5k·sf rows). */
  private def ordersByNation(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
      .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey"),
        (dec2(col("o_totalprice")) * 100).cast(LongType).as("cents"))

  /** Jarque–Bera normality test per nation on order totals. Values are
    * quantized to whole dollars (cents DIV 100) so the 4th raw moment sum
    * stays inside DECIMAL(38)/HUGEINT up to sf≈100 (x ≤ 6e5 ⇒ Σx⁴ ≤
    * 1.3e23·rows). Central moments come from the raw sums in DOUBLE with
    * the identical expression DAG on both engines — each nation's row is
    * assembled independently, so no double is ever summed across rows.
    * The data-quality use: flag strata whose value distribution departs
    * from the shape the downstream model assumes. */
  val qJarqueBera = Q(
    "q_jarque_bera",
    """WITH x AS (
      |  SELECT n_name,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      // 100 AS v
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |g AS (
      |  SELECT n_name, CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(v AS HUGEINT)) AS s1,
      |    sum(CAST(v AS HUGEINT) * v) AS s2,
      |    sum(CAST(v AS HUGEINT) * v * v) AS s3,
      |    sum(CAST(v AS HUGEINT) * v * v * v) AS s4
      |  FROM x GROUP BY n_name),
      |r AS (
      |  SELECT n_name, n,
      |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
      |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
      |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
      |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      |  FROM g),
      |c AS (
      |  SELECT n_name, n, m,
      |    r2 - m * m AS m2,
      |    r3 - 3 * m * r2 + 2 * m * m * m AS m3,
      |    r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m AS m4
      |  FROM r),
      |k AS (
      |  SELECT n_name, n, m2,
      |    m3 / (m2 * sqrt(m2)) AS skew,
      |    m4 / (m2 * m2) - 3 AS ex_kurt
      |  FROM c)
      |SELECT n_name, CAST(n AS BIGINT) AS n,
      |  ROUND(skew, 6) AS skewness, ROUND(ex_kurt, 6) AS ex_kurtosis,
      |  ROUND(CAST(n AS DOUBLE) / 6
      |    * (skew * skew + ex_kurt * ex_kurt / 4), 6) AS jb
      |FROM k ORDER BY n_name""".stripMargin) { (s, d) =>
    val x = ordersByNation(s, d)
      .select(col("n_name"), expr("cents DIV 100").as("v"))
    val g = x.groupBy("n_name").agg(
      count(lit(1)).cast(big38).as("n"),
      sum(col("v").cast(big38)).as("s1"),
      sum(col("v").cast(big38) * col("v")).as("s2"),
      sum(col("v").cast(big38) * col("v") * col("v")).as("s3"),
      sum(col("v").cast(big38) * col("v") * col("v") * col("v")).as("s4"))
    val r = g.select(col("n_name"), col("n"),
      (col("s1").cast(DoubleType) / col("n").cast(DoubleType)).as("m"),
      (col("s2").cast(DoubleType) / col("n").cast(DoubleType)).as("r2"),
      (col("s3").cast(DoubleType) / col("n").cast(DoubleType)).as("r3"),
      (col("s4").cast(DoubleType) / col("n").cast(DoubleType)).as("r4"))
    val c = r.select(col("n_name"), col("n"), col("m"),
      (col("r2") - col("m") * col("m")).as("m2"),
      (col("r3") - lit(3) * col("m") * col("r2")
        + lit(2) * col("m") * col("m") * col("m")).as("m3"),
      (col("r4") - lit(4) * col("m") * col("r3")
        + lit(6) * col("m") * col("m") * col("r2")
        - lit(3) * col("m") * col("m") * col("m") * col("m")).as("m4"))
    val k = c.select(col("n_name"), col("n"), col("m2"),
      (col("m3") / (col("m2") * sqrt(col("m2")))).as("skew"),
      (col("m4") / (col("m2") * col("m2")) - 3).as("ex_kurt"))
    k.select(col("n_name"), col("n").cast(LongType).as("n"),
      round(col("skew"), 6).as("skewness"),
      round(col("ex_kurt"), 6).as("ex_kurtosis"),
      round(col("n").cast(DoubleType) / 6
        * (col("skew") * col("skew")
          + col("ex_kurt") * col("ex_kurt") / 4), 6).as("jb"))
      .orderBy("n_name")
  }

  /** Brown–Forsythe variance-homogeneity test across order priorities:
    * absolute deviations from the per-group MEDIAN (median(double) is
    * cross-engine-stable — the q_anomaly_mad precedent), quantized to
    * whole cents (the deviation of 2-dp money is cent-integral, so
    * round() only strips float noise), then the q_anova assembly on the
    * integer deviations: per-group exact HUGEINT sums, per-group double
    * divisions rounded back to HUGEINT before the k-row cross-group sum.
    * The guard a heteroscedasticity-sensitive downstream (ANOVA, OLS)
    * runs before trusting its own F-tests. */
  val qLevene = Q(
    "q_levene",
    """WITH x AS (
      |  SELECT o_orderpriority AS prio, o_totalprice AS v FROM orders),
      |med AS (SELECT prio, median(v) AS med FROM x GROUP BY prio),
      |z AS (
      |  SELECT x.prio,
      |    CAST(round(abs(x.v - med.med) * 100) AS BIGINT) AS z
      |  FROM x JOIN med ON x.prio = med.prio),
      |g AS (
      |  SELECT prio, CAST(count(*) AS HUGEINT) AS ng,
      |    sum(CAST(z AS HUGEINT)) AS sg,
      |    sum(CAST(z AS HUGEINT) * z) AS qg
      |  FROM z GROUP BY prio),
      |tot AS (
      |  SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s,
      |    sum(CAST(ROUND(CAST(sg * sg AS DOUBLE) / CAST(ng AS DOUBLE))
      |        AS HUGEINT)) AS ssb_part,
      |    sum(CAST(ROUND(CAST(ng * qg - sg * sg AS DOUBLE)
      |        / CAST(ng AS DOUBLE)) AS HUGEINT)) AS ssw
      |  FROM g),
      |f AS (
      |  SELECT k, n,
      |    CAST(ssb_part AS DOUBLE)
      |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |      AS ssb,
      |    CAST(ssw AS DOUBLE) AS ssw
      |  FROM tot)
      |SELECT CAST(k AS INT) AS k, CAST(n AS BIGINT) AS n,
      |  ROUND(ssb / (k - 1) / (ssw / (n - k)), 6) AS f_stat
      |FROM f""".stripMargin) { (s, d) =>
    val x = t(s, d, "orders")
      .select(col("o_orderpriority").as("prio"), col("o_totalprice").as("v"))
    val med = x.groupBy("prio").agg(median(col("v")).as("med"))
    val z = x.join(broadcast(med), "prio")
      .select(col("prio"),
        round(abs(col("v") - col("med")) * 100).cast(LongType).as("z"))
    val g = z.groupBy("prio").agg(
      count(lit(1)).cast(big38).as("ng"),
      sum(col("z").cast(big38)).as("sg"),
      sum(col("z").cast(big38) * col("z")).as("qg"))
    val tot = g.agg(count(lit(1)).as("k"),
      sum(col("ng")).as("n"), sum(col("sg")).as("s"),
      sum(round((col("sg") * col("sg")).cast(DoubleType)
        / col("ng").cast(DoubleType)).cast(big38)).as("ssb_part"),
      sum(round((col("ng") * col("qg") - col("sg") * col("sg"))
        .cast(DoubleType) / col("ng").cast(DoubleType)).cast(big38)).as("ssw"))
    val f = tot.select(col("k"), col("n"),
      (col("ssb_part").cast(DoubleType)
        - col("s").cast(DoubleType) * col("s").cast(DoubleType)
          / col("n").cast(DoubleType)).as("ssb"),
      col("ssw").cast(DoubleType).as("ssw"))
    f.select(col("k").cast(IntegerType).as("k"),
      col("n").cast(LongType).as("n"),
      round(col("ssb") / (col("k") - 1)
        / (col("ssw") / (col("n") - col("k"))), 6).as("f_stat"))
  }

  /** Wilson score confidence interval per nation for the urgent-order
    * share. Everything up to the final per-row expression is an exact
    * integer count; z is a fixed literal so both engines evaluate the
    * identical closed form. The small-sample-safe rate interval a
    * per-stratum quality dashboard should show instead of ±1.96·SE. */
  val qBinomialCi = Q(
    "q_binomial_ci",
    """WITH g AS (
      |  SELECT n_name, count(*) AS n,
      |    sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
      |      AS k
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name),
      |w AS (
      |  SELECT n_name, n, k,
      |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    1.959964 * 1.959964 / CAST(n AS DOUBLE) AS z2n
      |  FROM g)
      |SELECT n_name, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  ROUND(p, 6) AS rate,
      |  ROUND((p + z2n / 2 - 1.959964
      |    * sqrt(p * (1 - p) / CAST(n AS DOUBLE) + z2n * z2n / 4))
      |    / (1 + z2n), 6) AS lo,
      |  ROUND((p + z2n / 2 + 1.959964
      |    * sqrt(p * (1 - p) / CAST(n AS DOUBLE) + z2n * z2n / 4))
      |    / (1 + z2n), 6) AS hi
      |FROM w ORDER BY n_name""".stripMargin) { (s, d) =>
    val g = t(s, d, "orders").select("o_custkey", "o_orderpriority")
      .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
          .as("k"))
    val zLit = lit(1.959964)
    val w = g.select(col("n_name"), col("n"), col("k"),
      (col("k").cast(DoubleType) / col("n").cast(DoubleType)).as("p"),
      (zLit * zLit / col("n").cast(DoubleType)).as("z2n"))
    w.select(col("n_name"), col("n").cast(LongType).as("n"),
      col("k").cast(LongType).as("k"),
      round(col("p"), 6).as("rate"),
      round((col("p") + col("z2n") / 2 - zLit
        * sqrt(col("p") * (lit(1) - col("p")) / col("n").cast(DoubleType)
          + col("z2n") * col("z2n") / 4)) / (lit(1) + col("z2n")), 6).as("lo"),
      round((col("p") + col("z2n") / 2 + zLit
        * sqrt(col("p") * (lit(1) - col("p")) / col("n").cast(DoubleType)
          + col("z2n") * col("z2n") / 4)) / (lit(1) + col("z2n")), 6).as("hi"))
      .orderBy("n_name")
  }

  /** McNemar's paired test over two document-quality rules evaluated on
    * the SAME corpus rows (rule A: n_chars > 300; rule B: whitespace
    * count > 55 — both near the fixture median, so the discordant cells
    * are populated). Only the two disagreement counts matter; the
    * continuity-corrected χ² is one closed-form double. The labeler- /
    * filter-comparison primitive: "did swapping rule A for rule B change
    * what gets kept?" with pairing (same docs) taken into account. */
  val qMcnemar = Q(
    "q_mcnemar",
    """WITH x AS (
      |  SELECT CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS a,
      |    CASE WHEN length(text) - length(replace(text, ' ', '')) > 55
      |      THEN 1 ELSE 0 END AS b
      |  FROM documents),
      |m AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS b10,
      |    sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS b01,
      |    sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS both_keep
      |  FROM x)
      |SELECT CAST(n AS BIGINT) AS n, CAST(b10 AS BIGINT) AS a_only,
      |  CAST(b01 AS BIGINT) AS b_only, CAST(both_keep AS BIGINT) AS both,
      |  ROUND((abs(CAST(b10 AS DOUBLE) - CAST(b01 AS DOUBLE)) - 1)
      |    * (abs(CAST(b10 AS DOUBLE) - CAST(b01 AS DOUBLE)) - 1)
      |    / CAST(b10 + b01 AS DOUBLE), 6) AS chi2
      |FROM m""".stripMargin) { (s, d) =>
    val x = t(s, d, "documents").select(
      when(col("n_chars") > 300, 1).otherwise(0).as("a"),
      when(length(col("text"))
        - length(regexp_replace(col("text"), " ", "")) > 55, 1)
        .otherwise(0).as("b"))
    val m = x.agg(count(lit(1)).as("n"),
      sum(when(col("a") === 1 && col("b") === 0, 1).otherwise(0)).as("b10"),
      sum(when(col("a") === 0 && col("b") === 1, 1).otherwise(0)).as("b01"),
      sum(when(col("a") === 1 && col("b") === 1, 1).otherwise(0))
        .as("both_keep"))
    m.select(col("n").cast(LongType).as("n"),
      col("b10").cast(LongType).as("a_only"),
      col("b01").cast(LongType).as("b_only"),
      col("both_keep").cast(LongType).as("both"),
      round((abs(col("b10").cast(DoubleType) - col("b01").cast(DoubleType))
        - 1)
        * (abs(col("b10").cast(DoubleType) - col("b01").cast(DoubleType))
          - 1)
        / (col("b10") + col("b01")).cast(DoubleType), 6).as("chi2"))
  }

  /** 10% two-sided trimmed mean of order value per priority. Per-group
    * ranks come from ONE GlobalRank pass ordered by (prio, cents, key) —
    * group-local rank = global rank − broadcast per-group offset, so
    * there is no per-group window over the fact table (5 groups would
    * mean 5 data-sized window partitions at 100 TB). The kept-slice sum
    * is exact integer cents; one double division at the end. The robust
    * location estimate for heavy-tailed value columns. */
  val qTrimmedMean = Q(
    "q_trimmed_mean",
    """WITH x AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |        AS BIGINT), o_orderkey) AS rk,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS ng
      |  FROM orders),
      |kept AS (
      |  SELECT prio, cents FROM x
      |  WHERE rk > ng // 10 AND rk <= ng - ng // 10)
      |SELECT prio, count(*) AS n_kept,
      |  ROUND(CAST(sum(CAST(cents AS HUGEINT)) AS DOUBLE)
      |    / count(*) / 100, 6) AS trimmed_mean
      |FROM kept GROUP BY prio ORDER BY prio""".stripMargin) { (s, d) =>
    val x = t(s, d, "orders").select(
      col("o_orderpriority").as("prio"), col("o_orderkey"),
      (dec2(col("o_totalprice")) * 100).cast(LongType).as("cents"))
      // GlobalRank range-buckets on a numeric leading sort column; the
      // priority's leading digit orders identically to the full string,
      // so (digit·10¹² + cents) is a single sortable composite (cents <
      // 10⁸ keeps the fields disjoint)
      .withColumn("skey",
        substring(col("prio"), 1, 1).cast(LongType) * lit(1000000000000L)
          + col("cents"))
    val (ranked, _) = graft.plans.GlobalRank.withGlobalRowNumber(
      x, "grk", 32, col("skey"), col("o_orderkey"))
    // group-local rank: global rank minus the group's first rank + 1;
    // offsets are a 5-row broadcast, never a per-group window
    val offs = ranked.groupBy("prio")
      .agg(min(col("grk")).as("off"), count(lit(1)).as("ng"))
    val kept = ranked.join(broadcast(offs), "prio")
      .select(col("prio"), col("cents"), col("ng"),
        (col("grk") - col("off") + 1).as("rk"))
      .filter(col("rk") > expr("ng DIV 10")
        && col("rk") <= col("ng") - expr("ng DIV 10"))
    kept.groupBy("prio")
      .agg(count(lit(1)).as("n_kept"),
        round(sum(col("cents").cast(big38)).cast(DoubleType)
          / count(lit(1)) / 100, 6).as("trimmed_mean"))
      .orderBy("prio")
  }

  /** Simpson's-paradox screen: the discount→quantity association per
    * return flag vs pooled across flags. All five co-moment sums are
    * exact integers (discount is 2-dp ⇒ percent units are integral;
    * quantity is integral), the pooled sums are exact integer adds of
    * the 3 per-group rows, and each OLS slope is one double division.
    * A per-group/pooled sign disagreement is the classic aggregation
    * trap a segmentation dashboard must surface before anyone acts on
    * the pooled number. */
  val qSimpsons = Q(
    "q_simpsons",
    """WITH x AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(round(l_discount * 100) AS BIGINT) AS xd,
      |    CAST(l_quantity AS BIGINT) AS yq
      |  FROM lineitem),
      |g AS (
      |  SELECT grp, CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(xd AS HUGEINT)) AS sx, sum(CAST(yq AS HUGEINT)) AS sy,
      |    sum(CAST(xd AS HUGEINT) * yq) AS sxy,
      |    sum(CAST(xd AS HUGEINT) * xd) AS sxx
      |  FROM x GROUP BY grp),
      |p AS (
      |  SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
      |    sum(sxy) AS sxy, sum(sxx) AS sxx
      |  FROM g),
      |sl AS (
      |  SELECT g.grp, g.n,
      |    CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
      |      / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE) AS slope,
      |    CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
      |      / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE) AS pooled
      |  FROM g CROSS JOIN p)
      |SELECT grp, CAST(n AS BIGINT) AS n, ROUND(slope, 6) AS slope,
      |  ROUND(pooled, 6) AS pooled_slope,
      |  CASE WHEN (slope > 0) <> (pooled > 0) THEN 1 ELSE 0 END
      |    AS sign_flip
      |FROM sl ORDER BY grp""".stripMargin) { (s, d) =>
    val x = t(s, d, "lineitem").select(
      col("l_returnflag").as("grp"),
      round(col("l_discount") * 100).cast(LongType).as("xd"),
      col("l_quantity").cast(LongType).as("yq"))
    val g = x.groupBy("grp").agg(
      count(lit(1)).cast(big38).as("n"),
      sum(col("xd").cast(big38)).as("sx"),
      sum(col("yq").cast(big38)).as("sy"),
      sum(col("xd").cast(big38) * col("yq")).as("sxy"),
      sum(col("xd").cast(big38) * col("xd")).as("sxx"))
    val p = g.agg(sum("n").as("pn"), sum("sx").as("psx"),
      sum("sy").as("psy"), sum("sxy").as("psxy"), sum("sxx").as("psxx"))
    val sl = g.crossJoin(broadcast(p)).select(col("grp"), col("n"),
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
        / (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
        .as("slope"),
      ((col("pn") * col("psxy") - col("psx") * col("psy")).cast(DoubleType)
        / (col("pn") * col("psxx") - col("psx") * col("psx"))
          .cast(DoubleType)).as("pooled"))
    sl.select(col("grp"), col("n").cast(LongType).as("n"),
      round(col("slope"), 6).as("slope"),
      round(col("pooled"), 6).as("pooled_slope"),
      when((col("slope") > 0) =!= (col("pooled") > 0), 1).otherwise(0)
        .as("sign_flip"))
      .orderBy("grp")
  }

  /** Calendar-completeness audit per event type: expected days between
    * the type's first and last event vs days actually observed — the
    * "did ingestion silently skip days?" freshness check that catches
    * holes a row-count monitor can't see. One scan, two exact date
    * aggregates; no day-grid explode is needed because only the COUNT
    * of missing days is reported, not the days themselves. */
  val qMissingDays = Q(
    "q_missing_days",
    """WITH g AS (
      |  SELECT event_type, CAST(min(CAST(ts AS DATE)) AS DATE) AS d_min,
      |    CAST(max(CAST(ts AS DATE)) AS DATE) AS d_max,
      |    count(DISTINCT CAST(ts AS DATE)) AS days_observed
      |  FROM events GROUP BY event_type)
      |SELECT event_type, d_min, d_max,
      |  date_diff('day', d_min, d_max) + 1 AS days_expected,
      |  days_observed,
      |  date_diff('day', d_min, d_max) + 1 - days_observed
      |    AS days_missing,
      |  ROUND(CAST(days_observed AS DOUBLE)
      |    / CAST(date_diff('day', d_min, d_max) + 1 AS DOUBLE), 6)
      |    AS coverage
      |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
    val g = t(s, d, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type")
      .agg(min(col("day")).as("d_min"), max(col("day")).as("d_max"),
        countDistinct(col("day")).as("days_observed"))
    g.select(col("event_type"), col("d_min"), col("d_max"),
      (datediff(col("d_max"), col("d_min")) + 1).cast(LongType)
        .as("days_expected"),
      col("days_observed"),
      ((datediff(col("d_max"), col("d_min")) + 1).cast(LongType)
        - col("days_observed")).as("days_missing"),
      round(col("days_observed").cast(DoubleType)
        / (datediff(col("d_max"), col("d_min")) + 1).cast(DoubleType), 6)
        .as("coverage"))
      .orderBy("event_type")
  }

  /** Degree assortativity of the thresholded co-purchase graph (the
    * q_degree_hist edge definition): Pearson r between endpoint degrees
    * over the directed edge list (each undirected edge counted both
    * ways — Newman's convention). Candidate edges come from the bounded
    * per-order self-join, never all-pairs; the Pearson sums are exact
    * HUGEINT. Hub-hub vs hub-leaf wiring decides whether hub failures
    * cascade, and whether degree-based sampling is biased. */
  val qAssortativity = Q(
    "q_assortativity",
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e AS (
      |  SELECT pa AS src, pb AS dst FROM (
      |    SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_co
      |    FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |    GROUP BY 1, 2) c
      |  WHERE n_co >= 2),
      |deg AS (
      |  SELECT v, count(*) AS deg FROM (
      |    SELECT src AS v FROM e UNION ALL SELECT dst FROM e) u
      |  GROUP BY v),
      |de AS (
      |  SELECT u, v FROM (
      |    SELECT src AS u, dst AS v FROM e
      |    UNION ALL SELECT dst AS u, src AS v FROM e) b),
      |jk AS (
      |  SELECT CAST(du.deg AS HUGEINT) AS j, CAST(dv.deg AS HUGEINT) AS k
      |  FROM de JOIN deg du ON de.u = du.v JOIN deg dv ON de.v = dv.v),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(j) AS sj, sum(k) AS sk,
      |    sum(j * k) AS sjk, sum(j * j) AS sj2, sum(k * k) AS sk2
      |  FROM jk)
      |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
      |  (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
      |  ROUND(CAST(n * sjk - sj * sk AS DOUBLE)
      |    / sqrt(CAST(n * sj2 - sj * sj AS DOUBLE)
      |      * CAST(n * sk2 - sk * sk AS DOUBLE)), 6) AS assortativity
      |FROM m""".stripMargin) { (s, d) =>
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= 2)
      .select("src", "dst")
    val deg = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val de = e.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(e.select(col("dst").as("u"), col("src").as("v")))
    // vertex-keyed equi-joins (AQE broadcasts the degree table when it
    // fits; the joins stay shuffle-correct when it doesn't at 100 TB)
    val jk = de
      .join(deg.select(col("v").as("u"), col("deg").as("ju")), "u")
      .join(deg.select(col("v"), col("deg").as("kv")), "v")
      .select(col("ju").cast(big38).as("j"), col("kv").cast(big38).as("k"))
    val m = jk.agg(count(lit(1)).cast(big38).as("n"),
      sum("j").as("sj"), sum("k").as("sk"),
      sum(col("j") * col("k")).as("sjk"),
      sum(col("j") * col("j")).as("sj2"),
      sum(col("k") * col("k")).as("sk2"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    m.crossJoin(broadcast(nNodes)).select(
      expr("CAST(n / 2 AS BIGINT)").as("n_edges"),
      col("n_nodes"),
      round((col("n") * col("sjk") - col("sj") * col("sk")).cast(DoubleType)
        / sqrt((col("n") * col("sj2") - col("sj") * col("sj"))
          .cast(DoubleType)
          * (col("n") * col("sk2") - col("sk") * col("sk"))
            .cast(DoubleType)), 6).as("assortativity"))
  }

  /** TOST equivalence test (two one-sided Welch t's, ±$500 margin) for
    * AUTOMOBILE-segment vs rest order values — the "shipping the change
    * is SAFE" readout that a non-significant q_ttest_welch cannot give.
    * Reuses the Welch machinery: exact HUGEINT cent moments, doubles
    * only in the two final t expressions; equivalence = both one-sided
    * tests reject at α=0.05 (t crit 1.644854, a fixed literal). */
  val qTost = Q(
    "q_tost",
    """WITH x AS (
      |  SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
      |      AS grp,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |m AS (
      |  SELECT CAST(sum(grp) AS HUGEINT) AS n1,
      |    CAST(count(*) - sum(grp) AS HUGEINT) AS n2,
      |    sum(CASE WHEN grp = 1 THEN CAST(cents AS HUGEINT)
      |        ELSE CAST(0 AS HUGEINT) END) AS s1,
      |    sum(CASE WHEN grp = 0 THEN CAST(cents AS HUGEINT)
      |        ELSE CAST(0 AS HUGEINT) END) AS s2,
      |    sum(CASE WHEN grp = 1 THEN CAST(cents AS HUGEINT) * cents
      |        ELSE CAST(0 AS HUGEINT) END) AS q1,
      |    sum(CASE WHEN grp = 0 THEN CAST(cents AS HUGEINT) * cents
      |        ELSE CAST(0 AS HUGEINT) END) AS q2
      |  FROM x),
      |se AS (
      |  SELECT n1, n2,
      |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS diff,
      |    sqrt(CAST(n1 * q1 - s1 * s1 AS DOUBLE)
      |        / CAST(n1 * n1 * (n1 - 1) AS DOUBLE)
      |      + CAST(n2 * q2 - s2 * s2 AS DOUBLE)
      |        / CAST(n2 * n2 * (n2 - 1) AS DOUBLE)) AS se
      |  FROM m)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  ROUND(diff / 100, 6) AS mean_diff,
      |  ROUND((diff + 50000) / se, 6) AS t_lower,
      |  ROUND((diff - 50000) / se, 6) AS t_upper,
      |  CASE WHEN (diff + 50000) / se > 1.644854
      |    AND (diff - 50000) / se < -1.644854 THEN 1 ELSE 0 END
      |    AS equivalent
      |FROM se""".stripMargin) { (s, d) =>
    val x = t(s, d, "orders").select("o_custkey", "o_totalprice")
      .join(broadcast(t(s, d, "customer").select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(when(col("c_mktsegment") === "AUTOMOBILE", 1).otherwise(0)
        .as("grp"),
        (dec2(col("o_totalprice")) * 100).cast(LongType).as("cents"))
    val m = x.agg(
      sum(col("grp")).cast(big38).as("n1"),
      (count(lit(1)) - sum(col("grp"))).cast(big38).as("n2"),
      sum(when(col("grp") === 1, col("cents")).otherwise(0L).cast(big38))
        .as("s1"),
      sum(when(col("grp") === 0, col("cents")).otherwise(0L).cast(big38))
        .as("s2"),
      sum(when(col("grp") === 1, col("cents").cast(big38) * col("cents"))
        .otherwise(lit(0).cast(big38))).as("q1"),
      sum(when(col("grp") === 0, col("cents").cast(big38) * col("cents"))
        .otherwise(lit(0).cast(big38))).as("q2"))
    val se = m.select(col("n1"), col("n2"),
      (col("s1").cast(DoubleType) / col("n1").cast(DoubleType)
        - col("s2").cast(DoubleType) / col("n2").cast(DoubleType))
        .as("diff"),
      sqrt((col("n1") * col("q1") - col("s1") * col("s1")).cast(DoubleType)
        / (col("n1") * col("n1") * (col("n1") - 1)).cast(DoubleType)
        + (col("n2") * col("q2") - col("s2") * col("s2")).cast(DoubleType)
          / (col("n2") * col("n2") * (col("n2") - 1)).cast(DoubleType))
        .as("se"))
    se.select(col("n1").cast(LongType).as("n1"),
      col("n2").cast(LongType).as("n2"),
      round(col("diff") / 100, 6).as("mean_diff"),
      round((col("diff") + 50000) / col("se"), 6).as("t_lower"),
      round((col("diff") - 50000) / col("se"), 6).as("t_upper"),
      when((col("diff") + 50000) / col("se") > 1.644854
        && (col("diff") - 50000) / col("se") < -1.644854, 1).otherwise(0)
        .as("equivalent"))
  }

  /** Cochran–Mantel–Haenszel test of the segment→urgency association
    * stratified by nation, plus the Mantel-Haenszel common odds ratio —
    * the confounder-adjusted companion to q_simpsons: does the
    * association survive once the stratifier is held fixed? Per-stratum
    * 2×2 cells are exact integer counts; each stratum's numerator /
    * variance / OR terms are double-divided then ROUNDed back to ·10⁶
    * integers before the bounded cross-stratum sum (q_anova idiom). */
  val qCmhTest = Q(
    "q_cmh_test",
    """WITH x AS (
      |  SELECT n_name,
      |    CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS e,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |g AS (
      |  SELECT n_name, CAST(count(*) AS HUGEINT) AS nn,
      |    CAST(sum(e) AS HUGEINT) AS n1p,
      |    CAST(sum(y) AS HUGEINT) AS np1,
      |    CAST(sum(e * y) AS HUGEINT) AS n11
      |  FROM x GROUP BY n_name),
      |terms AS (
      |  SELECT nn, n1p, np1, n11,
      |    CAST(ROUND((CAST(n11 AS DOUBLE)
      |      - CAST(n1p * np1 AS DOUBLE) / CAST(nn AS DOUBLE)) * 1000000)
      |      AS BIGINT) AS num6,
      |    CAST(ROUND(CAST(n1p * (nn - n1p) AS DOUBLE)
      |      * CAST(np1 * (nn - np1) AS DOUBLE)
      |      / CAST(nn * nn AS DOUBLE) / CAST(nn - 1 AS DOUBLE) * 1000000)
      |      AS BIGINT) AS var6,
      |    CAST(ROUND(CAST(n11 * (nn - n1p - np1 + n11) AS DOUBLE)
      |      / CAST(nn AS DOUBLE) * 1000000) AS BIGINT) AS or_num6,
      |    CAST(ROUND(CAST((n1p - n11) * (np1 - n11) AS DOUBLE)
      |      / CAST(nn AS DOUBLE) * 1000000) AS BIGINT) AS or_den6
      |  FROM g),
      |agg AS (
      |  SELECT count(*) AS k, sum(nn) AS n, sum(num6) AS num6,
      |    sum(var6) AS var6, sum(or_num6) AS orn6, sum(or_den6) AS ord6
      |  FROM terms)
      |SELECT CAST(k AS INT) AS k, CAST(n AS BIGINT) AS n,
      |  ROUND((abs(CAST(num6 AS DOUBLE) / 1000000) - 0.5)
      |    * (abs(CAST(num6 AS DOUBLE) / 1000000) - 0.5)
      |    / (CAST(var6 AS DOUBLE) / 1000000), 6) AS cmh_chi2,
      |  ROUND(CAST(orn6 AS DOUBLE) / CAST(ord6 AS DOUBLE), 6) AS or_mh
      |FROM agg""".stripMargin) { (s, d) =>
    val x = t(s, d, "orders")
      .select("o_custkey", "o_orderpriority")
      .join(broadcast(t(s, d, "customer")
        .select("c_custkey", "c_nationkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        when(col("c_mktsegment") === "AUTOMOBILE", 1).otherwise(0).as("e"),
        when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("y"))
    val g = x.groupBy("n_name").agg(
      count(lit(1)).cast(big38).as("nn"),
      sum(col("e")).cast(big38).as("n1p"),
      sum(col("y")).cast(big38).as("np1"),
      sum(col("e") * col("y")).cast(big38).as("n11"))
    val terms = g.select(col("nn"), col("n1p"), col("np1"), col("n11"),
      round((col("n11").cast(DoubleType)
        - (col("n1p") * col("np1")).cast(DoubleType)
          / col("nn").cast(DoubleType)) * 1000000L)
        .cast(LongType).as("num6"),
      round((col("n1p") * (col("nn") - col("n1p"))).cast(DoubleType)
        * (col("np1") * (col("nn") - col("np1"))).cast(DoubleType)
        / (col("nn") * col("nn")).cast(DoubleType)
        / (col("nn") - 1).cast(DoubleType) * 1000000L)
        .cast(LongType).as("var6"),
      round((col("n11") * (col("nn") - col("n1p") - col("np1") + col("n11")))
        .cast(DoubleType) / col("nn").cast(DoubleType) * 1000000L)
        .cast(LongType).as("or_num6"),
      round(((col("n1p") - col("n11")) * (col("np1") - col("n11")))
        .cast(DoubleType) / col("nn").cast(DoubleType) * 1000000L)
        .cast(LongType).as("or_den6"))
    val agg = terms.agg(count(lit(1)).as("k"), sum(col("nn")).as("n"),
      sum(col("num6")).as("num6"), sum(col("var6")).as("var6"),
      sum(col("or_num6")).as("orn6"), sum(col("or_den6")).as("ord6"))
    agg.select(col("k").cast(IntegerType).as("k"),
      col("n").cast(LongType).as("n"),
      round((abs(col("num6").cast(DoubleType) / 1000000L) - 0.5)
        * (abs(col("num6").cast(DoubleType) / 1000000L) - 0.5)
        / (col("var6").cast(DoubleType) / 1000000L), 6).as("cmh_chi2"),
      round(col("orn6").cast(DoubleType) / col("ord6").cast(DoubleType), 6)
        .as("or_mh"))
  }

  /** Partial correlation of discount and quantity controlling for line
    * revenue — does the discount→quantity association survive holding
    * the money column fixed? ONE lineitem scan collects all nine exact
    * DECIMAL(38) co-moment sums (2-dp discount ⇒ integral percent units,
    * exact cents); the three Pearson r's and the partial-r closed form
    * are one-row final doubles with identical op order on both engines. */
  val qPartialCorr = Q(
    "q_partial_corr",
    """WITH x AS (
      |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS xv,
      |    CAST(l_quantity AS BIGINT) AS yv,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS zv
      |  FROM lineitem),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(xv AS HUGEINT)) AS sx, sum(CAST(yv AS HUGEINT)) AS sy,
      |    sum(CAST(zv AS HUGEINT)) AS sz,
      |    sum(CAST(xv AS HUGEINT) * yv) AS sxy,
      |    sum(CAST(xv AS HUGEINT) * zv) AS sxz,
      |    sum(CAST(yv AS HUGEINT) * zv) AS syz,
      |    sum(CAST(xv AS HUGEINT) * xv) AS sxx,
      |    sum(CAST(yv AS HUGEINT) * yv) AS syy,
      |    sum(CAST(zv AS HUGEINT) * zv) AS szz
      |  FROM x),
      |r AS (
      |  SELECT n,
      |    CAST(n * sxy - sx * sy AS DOUBLE)
      |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |        * CAST(n * syy - sy * sy AS DOUBLE)) AS rxy,
      |    CAST(n * sxz - sx * sz AS DOUBLE)
      |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |        * CAST(n * szz - sz * sz AS DOUBLE)) AS rxz,
      |    CAST(n * syz - sy * sz AS DOUBLE)
      |      / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
      |        * CAST(n * szz - sz * sz AS DOUBLE)) AS ryz
      |  FROM m)
      |SELECT CAST(n AS BIGINT) AS n, ROUND(rxy, 6) AS r_xy,
      |  ROUND(rxz, 6) AS r_xz, ROUND(ryz, 6) AS r_yz,
      |  ROUND((rxy - rxz * ryz)
      |    / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6) AS r_xy_given_z
      |FROM r""".stripMargin) { (s, d) =>
    val x = t(s, d, "lineitem").select(
      round(col("l_discount") * 100).cast(LongType).as("xv"),
      col("l_quantity").cast(LongType).as("yv"),
      (dec2(col("l_extendedprice")) * 100).cast(LongType).as("zv"))
    val m = x.agg(count(lit(1)).cast(big38).as("n"),
      sum(col("xv").cast(big38)).as("sx"),
      sum(col("yv").cast(big38)).as("sy"),
      sum(col("zv").cast(big38)).as("sz"),
      sum(col("xv").cast(big38) * col("yv")).as("sxy"),
      sum(col("xv").cast(big38) * col("zv")).as("sxz"),
      sum(col("yv").cast(big38) * col("zv")).as("syz"),
      sum(col("xv").cast(big38) * col("xv")).as("sxx"),
      sum(col("yv").cast(big38) * col("yv")).as("syy"),
      sum(col("zv").cast(big38) * col("zv")).as("szz"))
    val r = m.select(col("n"),
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
        / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast(DoubleType)
          * (col("n") * col("syy") - col("sy") * col("sy"))
            .cast(DoubleType))).as("rxy"),
      ((col("n") * col("sxz") - col("sx") * col("sz")).cast(DoubleType)
        / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast(DoubleType)
          * (col("n") * col("szz") - col("sz") * col("sz"))
            .cast(DoubleType))).as("rxz"),
      ((col("n") * col("syz") - col("sy") * col("sz")).cast(DoubleType)
        / sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast(DoubleType)
          * (col("n") * col("szz") - col("sz") * col("sz"))
            .cast(DoubleType))).as("ryz"))
    r.select(col("n").cast(LongType).as("n"),
      round(col("rxy"), 6).as("r_xy"),
      round(col("rxz"), 6).as("r_xz"),
      round(col("ryz"), 6).as("r_yz"),
      round((col("rxy") - col("rxz") * col("ryz"))
        / sqrt((lit(1) - col("rxz") * col("rxz"))
          * (lit(1) - col("ryz") * col("ryz"))), 6).as("r_xy_given_z"))
  }

  /** Overdispersion (index-of-dispersion) test per event type on daily
    * event counts: D = var/mean over the type's observed days, with
    * χ² = D·(n−1) against the Poisson null — decides whether a plain
    * Poisson alert threshold is valid or a negative-binomial band is
    * needed. Daily counts are exact integers; variance comes from exact
    * HUGEINT count moments over the bounded day domain; D and χ² are
    * per-row finals. */
  val qDispersion = Q(
    "q_dispersion",
    """WITH dc AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(c AS HUGEINT)) AS s,
      |    sum(CAST(c AS HUGEINT) * c) AS q
      |  FROM dc GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days,
      |  ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_daily,
      |  ROUND(CAST(n * q - s * s AS DOUBLE)
      |    / CAST(n * (n - 1) AS DOUBLE)
      |    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS dispersion,
      |  ROUND(CAST(n * q - s * s AS DOUBLE)
      |    / CAST(n * (n - 1) AS DOUBLE)
      |    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |    * CAST(n - 1 AS DOUBLE), 6) AS chi2
      |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
    val dc = t(s, d, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val g = dc.groupBy("event_type").agg(
      count(lit(1)).cast(big38).as("n"),
      sum(col("c").cast(big38)).as("s"),
      sum(col("c").cast(big38) * col("c")).as("q"))
    g.select(col("event_type"), col("n").cast(LongType).as("n_days"),
      round(col("s").cast(DoubleType) / col("n").cast(DoubleType), 6)
        .as("mean_daily"),
      round((col("n") * col("q") - col("s") * col("s")).cast(DoubleType)
        / (col("n") * (col("n") - 1)).cast(DoubleType)
        / (col("s").cast(DoubleType) / col("n").cast(DoubleType)), 6)
        .as("dispersion"),
      round((col("n") * col("q") - col("s") * col("s")).cast(DoubleType)
        / (col("n") * (col("n") - 1)).cast(DoubleType)
        / (col("s").cast(DoubleType) / col("n").cast(DoubleType))
        * (col("n") - 1).cast(DoubleType), 6).as("chi2"))
      .orderBy("event_type")
  }

  /** Q-Q decile table comparing AUTOMOBILE vs rest order values — the
    * full-distribution companion to q_ks_test's scalar: WHERE do the two
    * distributions diverge? Nearest-rank (type-1) deciles for both
    * groups come from ONE GlobalRank pass on the (group, cents, key)
    * composite (the q_trimmed_mean idiom — no per-group data-sized
    * window); the 9 decile rows assemble by exact integer rank match. */
  val qQqDeciles = Q(
    "q_qq_deciles",
    """WITH x AS (
      |  SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
      |      AS grp,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    row_number() OVER (PARTITION BY
      |      CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
      |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |        AS BIGINT), o_orderkey) AS rk,
      |    count(*) OVER (PARTITION BY
      |      CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)
      |      AS ng
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |q AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS d),
      |pick AS (
      |  SELECT q.d, x.grp, max(x.cents) AS v
      |  FROM q JOIN x ON x.rk = (q.d * x.ng + 9) // 10
      |  GROUP BY q.d, x.grp)
      |SELECT a.d AS decile,
      |  ROUND(CAST(a.v AS DOUBLE) / 100, 2) AS v_auto,
      |  ROUND(CAST(b.v AS DOUBLE) / 100, 2) AS v_rest,
      |  ROUND(CAST(a.v AS DOUBLE) / CAST(b.v AS DOUBLE), 6) AS qq_ratio
      |FROM pick a JOIN pick b ON a.d = b.d AND a.grp = 1 AND b.grp = 0
      |ORDER BY decile""".stripMargin) { (s, d) =>
    val x = t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
      .join(broadcast(t(s, d, "customer").select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(when(col("c_mktsegment") === "AUTOMOBILE", 1L).otherwise(0L)
        .as("grp"),
        (dec2(col("o_totalprice")) * 100).cast(LongType).as("cents"),
        col("o_orderkey"))
      .withColumn("skey", col("grp") * lit(1000000000000L) + col("cents"))
    val (ranked, _) = graft.plans.GlobalRank.withGlobalRowNumber(
      x, "grk", 32, col("skey"), col("o_orderkey"))
    val offs = ranked.groupBy("grp")
      .agg(min(col("grk")).as("off"), count(lit(1)).as("ng"))
    val local = ranked.join(broadcast(offs), "grp")
      .select(col("grp"), col("cents"), col("ng"),
        (col("grk") - col("off") + 1).as("rk"))
    val grid = s.range(1, 10).select(col("id").as("d"))
    val pick = local.join(broadcast(grid),
        col("rk") === expr("(d * ng + 9) DIV 10"))
      .groupBy("d", "grp").agg(max(col("cents")).as("v"))
    pick.filter(col("grp") === 1)
      .select(col("d").cast(IntegerType).as("decile"), col("v").as("va"))
      .join(pick.filter(col("grp") === 0)
        .select(col("d").cast(IntegerType).as("decile"), col("v").as("vb")),
        "decile")
      .select(col("decile"),
        round(col("va").cast(DoubleType) / 100, 2).as("v_auto"),
        round(col("vb").cast(DoubleType) / 100, 2).as("v_rest"),
        round(col("va").cast(DoubleType) / col("vb").cast(DoubleType), 6)
          .as("qq_ratio"))
      .orderBy("decile")
  }

  /** Interaction-matrix density audit for the customer×part implicit-
    * feedback matrix — the sparsity readout (users, items, observed
    * cells, density, interactions per user) every MF/ALS training run
    * should log before fitting: density decides rank and regularization
    * sanity. One orderkey-keyed fact-fact join; exact distinct counts. */
  val qMatrixDensity = Q(
    "q_matrix_density",
    """WITH io AS (
      |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |m AS (
      |  SELECT count(*) AS nnz, count(DISTINCT u) AS n_users,
      |    count(DISTINCT i) AS n_items
      |  FROM io)
      |SELECT CAST(n_users AS BIGINT) AS n_users,
      |  CAST(n_items AS BIGINT) AS n_items,
      |  CAST(nnz AS BIGINT) AS n_observed,
      |  ROUND(CAST(nnz AS DOUBLE)
      |    / (CAST(n_users AS DOUBLE) * CAST(n_items AS DOUBLE)), 6)
      |    AS density,
      |  ROUND(CAST(nnz AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
      |    AS items_per_user
      |FROM m""".stripMargin) { (s, d) =>
    val io = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey").as("u"))
      .join(t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey").as("i")),
        col("o_orderkey") === col("l_orderkey"))
      .select("u", "i").distinct()
    val m = io.agg(count(lit(1)).as("nnz"),
      countDistinct(col("u")).as("n_users"),
      countDistinct(col("i")).as("n_items"))
    m.select(col("n_users").cast(LongType).as("n_users"),
      col("n_items").cast(LongType).as("n_items"),
      col("nnz").cast(LongType).as("n_observed"),
      round(col("nnz").cast(DoubleType)
        / (col("n_users").cast(DoubleType) * col("n_items").cast(DoubleType)),
        6).as("density"),
      round(col("nnz").cast(DoubleType) / col("n_users").cast(DoubleType), 6)
        .as("items_per_user"))
  }

  /** Leading-token distribution per source — templates announce
    * themselves in how documents START (the complement of
    * q_boilerplate's whole-document shingle view): top first-token
    * share and ·10⁹-quantized first-token entropy per source. Linear:
    * one token per document, all aggregation on (source, token). */
  val qFirstTokenDist = Q(
    "q_first_token_dist",
    """WITH ft AS (
      |  SELECT source, string_split(text, ' ')[1] AS tok FROM documents),
      |g AS (SELECT source, tok, count(*) AS c FROM ft GROUP BY 1, 2),
      |n AS (SELECT source, sum(c) AS n, count(*) AS n_distinct,
      |    max(c) AS top_c
      |  FROM g GROUP BY source),
      |h AS (
      |  SELECT g.source, sum(CAST(ROUND(
      |      -(CAST(g.c AS DOUBLE) / CAST(n.n AS DOUBLE))
      |        * ln(CAST(g.c AS DOUBLE) / CAST(n.n AS DOUBLE))
      |      * 1000000000) AS BIGINT)) AS h9
      |  FROM g JOIN n ON g.source = n.source GROUP BY g.source)
      |SELECT n.source, CAST(n.n AS BIGINT) AS n_docs,
      |  CAST(n.n_distinct AS BIGINT) AS n_first_tokens,
      |  ROUND(CAST(n.top_c AS DOUBLE) / CAST(n.n AS DOUBLE), 6)
      |    AS top_share,
      |  ROUND(CAST(h.h9 AS DOUBLE) / 1000000000, 6) AS entropy
      |FROM n JOIN h ON n.source = h.source
      |ORDER BY n.source""".stripMargin) { (s, d) =>
    val ft = t(s, d, "documents").select(col("source"),
      split(col("text"), " ").getItem(0).as("tok"))
    val g = ft.groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val n = g.groupBy("source").agg(sum(col("c")).as("n"),
      count(lit(1)).as("n_distinct"), max(col("c")).as("top_c"))
    val h = g.join(broadcast(n.select("source", "n")), "source")
      .groupBy("source")
      .agg(sum(round(-(col("c").cast(DoubleType) / col("n").cast(DoubleType))
          * log(col("c").cast(DoubleType) / col("n").cast(DoubleType))
          * 1000000000L).cast(LongType)).as("h9"))
    n.join(h, "source")
      .select(col("source"), col("n").cast(LongType).as("n_docs"),
        col("n_distinct").cast(LongType).as("n_first_tokens"),
        round(col("top_c").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("top_share"),
        round(col("h9").cast(DoubleType) / 1000000000L, 6).as("entropy"))
      .orderBy("source")
  }

  /** Near-zero-variance feature screen over stacked categorical columns
    * (order status / priority / segment): top-two frequency ratio and
    * unique-value share per feature, with the standard caret-style NZV
    * flag (ratio > 19 and uniques < 0.1%) — drop-list generation before
    * one-hot/target encoding. Column stacking is two pruned projections
    * unioned; per-feature value domains are bounded. */
  val qNearZeroVar = Q(
    "q_near_zero_var",
    """WITH f AS (
      |  SELECT 'o_orderstatus' AS feature, o_orderstatus AS v FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', o_orderpriority FROM orders
      |  UNION ALL
      |  SELECT 'c_mktsegment', c_mktsegment FROM customer),
      |g AS (SELECT feature, v, count(*) AS c FROM f GROUP BY 1, 2),
      |r AS (
      |  SELECT feature, c,
      |    row_number() OVER (PARTITION BY feature
      |      ORDER BY c DESC, v) AS rk
      |  FROM g),
      |m AS (
      |  SELECT feature, sum(c) AS n, count(*) AS n_distinct,
      |    max(CASE WHEN rk = 1 THEN c END) AS c1,
      |    max(CASE WHEN rk = 2 THEN c END) AS c2
      |  FROM r GROUP BY feature)
      |SELECT feature, CAST(n AS BIGINT) AS n,
      |  CAST(n_distinct AS BIGINT) AS n_distinct,
      |  ROUND(CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE), 6) AS freq_ratio,
      |  ROUND(CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE), 6)
      |    AS pct_unique,
      |  CASE WHEN CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE) > 19
      |    AND CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE) < 0.001
      |    THEN 1 ELSE 0 END AS nzv
      |FROM m ORDER BY feature""".stripMargin) { (s, d) =>
    val f = t(s, d, "orders")
      .select(lit("o_orderstatus").as("feature"),
        col("o_orderstatus").as("v"))
      .unionByName(t(s, d, "orders")
        .select(lit("o_orderpriority").as("feature"),
          col("o_orderpriority").as("v")))
      .unionByName(t(s, d, "customer")
        .select(lit("c_mktsegment").as("feature"),
          col("c_mktsegment").as("v")))
    val g = f.groupBy("feature", "v").agg(count(lit(1)).as("c"))
    // bounded domain: |features|×|distinct values| ≤ dozens of rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("feature").orderBy(col("c").desc, col("v"))
    val m = g.withColumn("rk", row_number().over(w))
      .groupBy("feature")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        max(when(col("rk") === 1, col("c"))).as("c1"),
        max(when(col("rk") === 2, col("c"))).as("c2"))
    m.select(col("feature"), col("n").cast(LongType).as("n"),
      col("n_distinct").cast(LongType).as("n_distinct"),
      round(col("c1").cast(DoubleType) / col("c2").cast(DoubleType), 6)
        .as("freq_ratio"),
      round(col("n_distinct").cast(DoubleType) / col("n").cast(DoubleType),
        6).as("pct_unique"),
      when(col("c1").cast(DoubleType) / col("c2").cast(DoubleType) > 19
        && col("n_distinct").cast(DoubleType) / col("n").cast(DoubleType)
          < 0.001, 1).otherwise(0).as("nzv"))
      .orderBy("feature")
  }

  val all: Seq[Q] = Seq(qJarqueBera, qLevene, qBinomialCi, qMcnemar,
    qTrimmedMean, qSimpsons, qMissingDays, qAssortativity, qTost,
    qCmhTest, qPartialCorr, qDispersion,
    qQqDeciles, qMatrixDensity, qFirstTokenDist, qNearZeroVar)
}
