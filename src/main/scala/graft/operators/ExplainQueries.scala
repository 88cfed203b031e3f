package graft.operators

import graft.Q
import graft.Dsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-explanation operators: SHAP-style attributions, drop-one
  * feature importance, and regularization paths — all for the linear
  * models the registry already fits in closed form, so every
  * explanation is an exact-arithmetic property of the data (no trained
  * artifact, no sampling). House determinism contract: co-moment sums
  * are exact DECIMAL(38)/HUGEINT aggregates computed ONCE and broadcast;
  * doubles appear only in final per-row expressions with identical op
  * order on both engines; orderings quantize before ranking.
  *
  * The shared model: quantity ~ discount(pct) + extendedprice(dollars)
  * over lineitem — the same two-regressor normal-equation assembly as
  * q_regression_multi / q_granger.
  */
object ExplainQueries {

  private val big38 = DecimalType(38, 0)

  /** The exact co-moment row for (x1 = discount pct, x2 = price dollars,
    * y = quantity): all sums integral and reduction-order-proof. */
  private def moments(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(
        round(col("l_discount") * 100).cast(LongType).as("x1"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " DIV 100")
          .as("x2"),
        col("l_quantity").cast(LongType).as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1").cast(big38)).as("s1"),
        sum(col("x2").cast(big38)).as("s2"),
        sum(col("y").cast(big38)).as("sy"),
        sum(col("x1").cast(big38) * col("x1")).as("s11"),
        sum(col("x1").cast(big38) * col("x2")).as("s12"),
        sum(col("x2").cast(big38) * col("x2")).as("s22"),
        sum(col("x1").cast(big38) * col("y")).as("s1y"),
        sum(col("x2").cast(big38) * col("y")).as("s2y"),
        sum(col("y").cast(big38) * col("y")).as("syy"))

  /** The DuckDB mirror of [[moments]], shared by the three oracles. */
  private val momentsSql =
    """mo AS (
      |  SELECT count(*) AS n,
      |    sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT))
      |      AS s1,
      |    sum(CAST((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100)
      |      AS HUGEINT)) AS s2,
      |    sum(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sy,
      |    sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT)
      |      * CAST(round(l_discount * 100) AS BIGINT)) AS s11,
      |    sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT)
      |      * (CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100))
      |      AS s12,
      |    sum(CAST((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100)
      |        AS HUGEINT)
      |      * (CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100))
      |      AS s22,
      |    sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT)
      |      * CAST(l_quantity AS BIGINT)) AS s1y,
      |    sum(CAST((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100)
      |        AS HUGEINT)
      |      * CAST(l_quantity AS BIGINT)) AS s2y,
      |    sum(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
      |      * CAST(l_quantity AS BIGINT)) AS syy
      |  FROM lineitem)""".stripMargin

  /** The centered-sums + coefficients CTE used by all three oracles. */
  private val coefSql =
    """co AS (
      |  SELECT n,
      |    CAST(s1 AS DOUBLE) / n AS m1, CAST(s2 AS DOUBLE) / n AS m2,
      |    CAST(sy AS DOUBLE) / n AS my,
      |    CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS c11,
      |    CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS c12,
      |    CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS c22,
      |    CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS c1y,
      |    CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS c2y,
      |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy
      |  FROM mo),
      |bb AS (
      |  SELECT n, m1, m2, my, c11, c12, c22, c1y, c2y, cyy,
      |    (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
      |    (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
      |  FROM co)""".stripMargin

  /** Appends the centered sums and closed-form coefficients to the
    * Spark moment row (mirrors [[coefSql]] expression-for-expression). */
  private def withCoefs(mo: DataFrame): DataFrame = {
    val co = mo.select(col("n"),
      (col("s1").cast(DoubleType) / col("n")).as("m1"),
      (col("s2").cast(DoubleType) / col("n")).as("m2"),
      (col("sy").cast(DoubleType) / col("n")).as("my"),
      (col("s11").cast(DoubleType)
        - col("s1").cast(DoubleType) * col("s1") / col("n")).as("c11"),
      (col("s12").cast(DoubleType)
        - col("s1").cast(DoubleType) * col("s2") / col("n")).as("c12"),
      (col("s22").cast(DoubleType)
        - col("s2").cast(DoubleType) * col("s2") / col("n")).as("c22"),
      (col("s1y").cast(DoubleType)
        - col("s1").cast(DoubleType) * col("sy") / col("n")).as("c1y"),
      (col("s2y").cast(DoubleType)
        - col("s2").cast(DoubleType) * col("sy") / col("n")).as("c2y"),
      (col("syy").cast(DoubleType)
        - col("sy").cast(DoubleType) * col("sy") / col("n")).as("cyy"))
    co.select(col("*"),
      ((col("c1y") * col("c22") - col("c2y") * col("c12"))
        / (col("c11") * col("c22") - col("c12") * col("c12"))).as("b1"),
      ((col("c2y") * col("c11") - col("c1y") * col("c12"))
        / (col("c11") * col("c22") - col("c12") * col("c12"))).as("b2"))
  }

  /** Linear-SHAP attributions φ_j = b_j·(x_j − x̄_j) for the closed-form
    * two-feature model — for a LINEAR model the interventional Shapley
    * value is exactly this, no sampling needed — reported for the 10
    * rows the model leans on hardest (by ·10⁹-quantized |φ₁|+|φ₂|, then
    * keys, so the selected set is engine-identical). The explanation
    * pipeline shape at scale: ONE moment aggregate broadcast to a
    * per-row map stage, then a TakeOrdered. */
  val qShapLinear = Q(
    "q_shap_linear",
    s"""WITH $momentsSql,
      |$coefSql,
      |li AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(round(l_discount * 100) AS BIGINT) AS x1,
      |    (CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100) AS x2,
      |    CAST(l_quantity AS BIGINT) AS y
      |  FROM lineitem),
      |ph AS (
      |  SELECT li.l_orderkey, li.l_linenumber, li.y,
      |    bb.b1 * (li.x1 - bb.m1) AS phi1,
      |    bb.b2 * (li.x2 - bb.m2) AS phi2, bb.my
      |  FROM li, bb),
      |qq AS (
      |  SELECT *, CAST(ROUND((abs(phi1) + abs(phi2)) * 1000000000)
      |    AS BIGINT) AS q9
      |  FROM ph)
      |SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
      |  CAST(y AS BIGINT) AS quantity,
      |  CAST(ROUND(my * 1000000) AS BIGINT) / 1000000 AS phi0,
      |  CAST(ROUND(phi1 * 1000000) AS BIGINT) / 1000000 AS phi_discount,
      |  CAST(ROUND(phi2 * 1000000) AS BIGINT) / 1000000 AS phi_price,
      |  CAST(ROUND((my + phi1 + phi2) * 1000000) AS BIGINT) / 1000000
      |    AS prediction
      |FROM qq ORDER BY q9 DESC, l_orderkey, l_linenumber
      |LIMIT 10""".stripMargin) { (s, d) =>
    val bb = withCoefs(moments(s, d))
    val li = t(s, d, "lineitem").select(col("l_orderkey"),
      col("l_linenumber"),
      round(col("l_discount") * 100).cast(LongType).as("x1"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " DIV 100")
        .as("x2"),
      col("l_quantity").cast(LongType).as("y"))
    val ph = li.crossJoin(broadcast(bb))
      .select(col("l_orderkey"), col("l_linenumber"), col("y"),
        (col("b1") * (col("x1") - col("m1"))).as("phi1"),
        (col("b2") * (col("x2") - col("m2"))).as("phi2"), col("my"))
    val qq = ph.withColumn("q9",
      round((abs(col("phi1")) + abs(col("phi2"))) * 1000000000L)
        .cast(LongType))
    qq.orderBy(col("q9").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)
      .select(col("l_orderkey"),
        col("l_linenumber").cast(IntegerType).as("l_linenumber"),
        col("y").cast(LongType).as("quantity"),
        (round(col("my") * 1000000L).cast(LongType) / lit(1000000L))
          .as("phi0"),
        (round(col("phi1") * 1000000L).cast(LongType) / lit(1000000L))
          .as("phi_discount"),
        (round(col("phi2") * 1000000L).cast(LongType) / lit(1000000L))
          .as("phi_price"),
        (round((col("my") + col("phi1") + col("phi2")) * 1000000L)
          .cast(LongType) / lit(1000000L)).as("prediction"))
  }

  /** Drop-one feature importance in closed form: ΔR² of removing each
    * feature from the two-feature model, computed EXACTLY from the one
    * co-moment row (the restricted fits are simple regressions on the
    * remaining feature) — what permutation importance approximates by
    * resampling, a linear model yields by algebra. One aggregate, a
    * 2-row output. */
  val qFeatureImportance = Q(
    "q_feature_importance",
    s"""WITH $momentsSql,
      |$coefSql,
      |r AS (
      |  SELECT
      |    1 - (cyy - b1 * c1y - b2 * c2y) / cyy AS r2_full,
      |    (c1y * c1y / c11) / cyy AS r2_only1,
      |    (c2y * c2y / c22) / cyy AS r2_only2
      |  FROM bb)
      |SELECT f.feature,
      |  CAST(ROUND(r.r2_full * 1000000) AS BIGINT) / 1000000 AS r2_full,
      |  CAST(ROUND(CASE WHEN f.feature = 'discount_pct' THEN r.r2_only2
      |    ELSE r.r2_only1 END * 1000000) AS BIGINT) / 1000000
      |    AS r2_without,
      |  CAST(ROUND((r.r2_full - CASE WHEN f.feature = 'discount_pct'
      |    THEN r.r2_only2 ELSE r.r2_only1 END) * 1000000) AS BIGINT)
      |    / 1000000 AS delta_r2
      |FROM (SELECT unnest(['discount_pct', 'price']) AS feature) f, r
      |ORDER BY f.feature""".stripMargin) { (s, d) =>
    import s.implicits._
    val r = withCoefs(moments(s, d)).select(
      (lit(1) - (col("cyy") - col("b1") * col("c1y")
        - col("b2") * col("c2y")) / col("cyy")).as("r2_full"),
      ((col("c1y") * col("c1y") / col("c11")) / col("cyy")).as("r2_only1"),
      ((col("c2y") * col("c2y") / col("c22")) / col("cyy")).as("r2_only2"))
    val f = Seq("discount_pct", "price").toDF("feature")
    f.crossJoin(broadcast(r))
      .select(col("feature"),
        (round(col("r2_full") * 1000000L).cast(LongType) / lit(1000000L))
          .as("r2_full"),
        (round(when(col("feature") === "discount_pct", col("r2_only2"))
          .otherwise(col("r2_only1")) * 1000000L).cast(LongType)
          / lit(1000000L)).as("r2_without"),
        (round((col("r2_full")
          - when(col("feature") === "discount_pct", col("r2_only2"))
            .otherwise(col("r2_only1"))) * 1000000L).cast(LongType)
          / lit(1000000L)).as("delta_r2"))
      .orderBy("feature")
  }

  /** Ridge regularization path for the standardized two-feature model:
    * standardized coefficients at λ ∈ {0, 0.1, 1, 10} via the exact 2×2
    * closed-form inverse of (R + λI) on the correlation matrix — how
    * coefficients shrink and rotate under regularization, from ONE
    * co-moment aggregate and a 4-row λ grid. */
  val qRidgePath = Q(
    "q_ridge_path",
    s"""WITH $momentsSql,
      |$coefSql,
      |rr AS (
      |  SELECT c12 / sqrt(c11 * c22) AS r12,
      |    c1y / sqrt(c11 * cyy) AS r1y,
      |    c2y / sqrt(c22 * cyy) AS r2y
      |  FROM bb),
      |lam AS (SELECT CAST(unnest([0.0, 0.1, 1.0, 10.0]) AS DOUBLE)
      |  AS lambda)
      |SELECT lam.lambda,
      |  CAST(ROUND(((1 + lam.lambda) * rr.r1y - rr.r12 * rr.r2y)
      |    / ((1 + lam.lambda) * (1 + lam.lambda) - rr.r12 * rr.r12)
      |    * 1000000) AS BIGINT) / 1000000 AS beta1_std,
      |  CAST(ROUND(((1 + lam.lambda) * rr.r2y - rr.r12 * rr.r1y)
      |    / ((1 + lam.lambda) * (1 + lam.lambda) - rr.r12 * rr.r12)
      |    * 1000000) AS BIGINT) / 1000000 AS beta2_std
      |FROM lam, rr ORDER BY lam.lambda""".stripMargin) { (s, d) =>
    import s.implicits._
    val rr = withCoefs(moments(s, d)).select(
      (col("c12") / sqrt(col("c11") * col("c22"))).as("r12"),
      (col("c1y") / sqrt(col("c11") * col("cyy"))).as("r1y"),
      (col("c2y") / sqrt(col("c22") * col("cyy"))).as("r2y"))
    val lam = Seq(0.0, 0.1, 1.0, 10.0).toDF("lambda")
    lam.crossJoin(broadcast(rr))
      .select(col("lambda"),
        (round(((lit(1) + col("lambda")) * col("r1y")
          - col("r12") * col("r2y"))
          / ((lit(1) + col("lambda")) * (lit(1) + col("lambda"))
            - col("r12") * col("r12")) * 1000000L).cast(LongType)
          / lit(1000000L)).as("beta1_std"),
        (round(((lit(1) + col("lambda")) * col("r2y")
          - col("r12") * col("r1y"))
          / ((lit(1) + col("lambda")) * (lit(1) + col("lambda"))
            - col("r12") * col("r12")) * 1000000L).cast(LongType)
          / lit(1000000L)).as("beta2_std"))
      .orderBy("lambda")
  }

  val all: Seq[Q] = Seq(qShapLinear, qFeatureImportance, qRidgePath)
}
