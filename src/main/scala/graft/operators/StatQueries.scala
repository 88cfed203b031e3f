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

  val all: Seq[Q] = Seq(qJarqueBera, qLevene, qBinomialCi, qMcnemar,
    qTrimmedMean)
}
