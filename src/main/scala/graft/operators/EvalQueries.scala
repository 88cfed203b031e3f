package graft.operators

import graft.Q
import graft.Dsl._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-evaluation operators: the metrics a training pipeline computes
  * over scored datasets (AUC, decile lift, confusion matrices). The
  * fixture "model" is a deterministic score the oracle can reproduce —
  * order total as the score, urgent priority as the label — so every
  * metric is an exact-arithmetic property of the data, not of a trained
  * artifact (the trained-model variants live in the q_mf_* / q_metric_*
  * families). Determinism contract as everywhere: exact int/decimal
  * sums, GlobalRank total orders instead of unpartitioned windows,
  * doubles only in final expressions, round 6, total ORDER BY.
  */
object EvalQueries {

  /** score = order total in cents (exact), label = urgent priority. */
  private def scored(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      col("o_orderkey"),
      (dec2(col("o_totalprice")) * 100).cast(LongType).as("cents"),
      when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("label"))

  /** ROC AUC via the rank-sum (Mann–Whitney) identity: AUC =
    * (R₁ − n₁(n₁+1)/2) / (n₁n₀) where R₁ is the positive class's rank sum
    * under a TOTAL order (score, then key — the q_mannwhitney row-number
    * tie convention, documented rather than tie-averaged; money scores
    * make exact-cent ties rare). The ranking is GlobalRank (range-bucketed
    * two-pass — no unpartitioned window at 10¹⁰ rows); the rank sum is an
    * exact DECIMAL(38)/HUGEINT aggregate and the one division happens in
    * the final single-row select. */
  val qAuc = Q(
    "q_auc",
    """WITH x AS (
      |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
      |      AS label,
      |    row_number() OVER (ORDER BY
      |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
      |      o_orderkey) AS rk
      |  FROM orders),
      |m AS (
      |  SELECT CAST(sum(label) AS HUGEINT) AS n1,
      |    CAST(count(*) - sum(label) AS HUGEINT) AS n0,
      |    sum(CASE WHEN label = 1 THEN CAST(rk AS HUGEINT)
      |        ELSE CAST(0 AS HUGEINT) END) AS r1
      |  FROM x)
      |SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
      |  ROUND(CAST(2 * r1 - n1 * (n1 + 1) AS DOUBLE)
      |    / CAST(2 * n1 * n0 AS DOUBLE), 6) AS auc
      |FROM m""".stripMargin) { (s, d) =>
    val big38 = DecimalType(38, 0)
    val (ranked, _) = graft.plans.GlobalRank.withGlobalRowNumber(
      scored(s, d), "rk", 32, col("cents"), col("o_orderkey"))
    val m = ranked.agg(
      sum(col("label")).cast(big38).as("n1"),
      (count(lit(1)) - sum(col("label"))).cast(big38).as("n0"),
      sum(when(col("label") === 1, col("rk"))
        .otherwise(0L).cast(big38)).as("r1"))
    m.select(col("n1").cast(LongType).as("n_pos"),
      col("n0").cast(LongType).as("n_neg"),
      round((lit(2) * col("r1") - col("n1") * (col("n1") + 1)).cast(DoubleType)
        / (lit(2) * col("n1") * col("n0")).cast(DoubleType), 6).as("auc"))
  }

  /** Decile lift table: rank by score DESC (GlobalRank on the negated
    * score), deciles by exact integer division of the global row number,
    * per-decile response rate and CUMULATIVE lift over the 10-row
    * post-aggregation domain (the window never touches the fact table).
    * The campaign-targeting / ranking-quality readout. */
  val qLiftDeciles = Q(
    "q_lift_deciles",
    """WITH x AS (
      |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
      |      AS label,
      |    row_number() OVER (ORDER BY
      |      -CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
      |      o_orderkey) AS rn,
      |    count(*) OVER () AS n
      |  FROM orders),
      |d AS (
      |  SELECT CAST((rn - 1) * 10 // n AS INT) + 1 AS decile,
      |    count(*) AS n_rows, sum(label) AS n_pos
      |  FROM x GROUP BY 1),
      |tot AS (SELECT sum(n_rows) AS n, sum(n_pos) AS pos FROM d),
      |c AS (
      |  SELECT decile, n_rows, n_pos,
      |    sum(n_rows) OVER (ORDER BY decile) AS cum_rows,
      |    sum(n_pos) OVER (ORDER BY decile) AS cum_pos
      |  FROM d)
      |SELECT decile, n_rows, CAST(n_pos AS BIGINT) AS n_pos,
      |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS rate,
      |  ROUND(CAST(cum_pos AS DOUBLE) / CAST(cum_rows AS DOUBLE)
      |    / (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cum_lift
      |FROM c CROSS JOIN tot ORDER BY decile""".stripMargin) { (s, d) =>
    val (ranked, nTotal) = graft.plans.GlobalRank.withGlobalRowNumber(
      scored(s, d).withColumn("negc", -col("cents")), "rn", 32,
      col("negc"), col("o_orderkey"))
    // GlobalRank already counted the table — no second fact aggregate
    val dec = ranked
      .select(
        (expr(s"(rn - 1) * 10 DIV ${nTotal}L").cast(IntegerType) + 1)
          .as("decile"),
        col("label"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_rows"), sum(col("label")).as("n_pos"))
    val tot = dec.agg(sum("n_rows").as("n"), sum("n_pos").as("pos"))
    // 10-row bounded domain: an unpartitioned window here is free
    val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dec.withColumn("cum_rows", sum(col("n_rows")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_rows"),
        col("n_pos").cast(LongType).as("n_pos"),
        round(col("n_pos").cast(DoubleType) / col("n_rows").cast(DoubleType), 6)
          .as("rate"),
        round(col("cum_pos").cast(DoubleType) / col("cum_rows").cast(DoubleType)
          / (col("pos").cast(DoubleType) / col("n").cast(DoubleType)), 6)
          .as("cum_lift"))
      .orderBy("decile")
  }

  /** Confusion matrices at a panel of fixed decision thresholds —
    * precision/recall/F1/accuracy per operating point. ONE fact scan: the
    * threshold panel is a 3-row broadcast crossed into the scan, so the
    * whole sweep is a single bounded-domain aggregate; every cell is an
    * exact count and the ratios are final-expression doubles (nullif
    * guards empty cells). */
  val qConfusionMatrix = Q(
    "q_confusion_matrix",
    """WITH th AS (SELECT unnest([10000000, 20000000, 30000000]) AS thr),
      |x AS (
      |  SELECT thr,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS label,
      |    CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      >= thr THEN 1 ELSE 0 END AS pred
      |  FROM orders CROSS JOIN th),
      |m AS (
      |  SELECT thr,
      |    sum(pred * label) AS tp, sum(pred * (1 - label)) AS fp,
      |    sum((1 - pred) * label) AS fn,
      |    sum((1 - pred) * (1 - label)) AS tn
      |  FROM x GROUP BY thr)
      |SELECT CAST(thr AS BIGINT) AS thr,
      |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
      |  ROUND(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision,
      |  ROUND(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall,
      |  ROUND(CAST(2 * tp AS DOUBLE) / nullif(2 * tp + fp + fn, 0), 6) AS f1,
      |  ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
      |FROM m ORDER BY thr""".stripMargin) { (s, d) =>
    import s.implicits._
    val th = Seq(10000000L, 20000000L, 30000000L).toDF("thr")
    val x = scored(s, d).crossJoin(broadcast(th))
      .select(col("thr"), col("label"),
        when(col("cents") >= col("thr"), 1).otherwise(0).as("pred"))
    val m = x.groupBy("thr").agg(
      sum(col("pred") * col("label")).as("tp"),
      sum(col("pred") * (lit(1) - col("label"))).as("fp"),
      sum((lit(1) - col("pred")) * col("label")).as("fn"),
      sum((lit(1) - col("pred")) * (lit(1) - col("label"))).as("tn"))
    def r(num: Column, den: Column, name: String): Column =
      round(num.cast(DoubleType) / den, 6).as(name)
    m.select(col("thr"),
      col("tp").cast(LongType).as("tp"), col("fp").cast(LongType).as("fp"),
      col("fn").cast(LongType).as("fn"), col("tn").cast(LongType).as("tn"),
      r(col("tp"), nullif(col("tp") + col("fp"), lit(0)), "precision"),
      r(col("tp"), nullif(col("tp") + col("fn"), lit(0)), "recall"),
      r(lit(2) * col("tp"),
        nullif(lit(2) * col("tp") + col("fp") + col("fn"), lit(0)), "f1"),
      r(col("tp") + col("tn"),
        (col("tp") + col("fp") + col("fn") + col("tn")).cast(DoubleType),
        "accuracy"))
      .orderBy("thr")
  }

  val all: Seq[Q] = Seq(qAuc, qLiftDeciles, qConfusionMatrix)
}
