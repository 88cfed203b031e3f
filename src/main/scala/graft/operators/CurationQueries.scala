package graft.operators

import graft.Q
import graft.Dsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation / retention additions (round-7 continuation):
  * within-source boilerplate detection, recommendation novelty, and
  * retention-policy sweeps. House determinism contract throughout.
  */
object CurationQueries {

  private val big38 = DecimalType(38, 0)

  /** Within-source boilerplate profile: the share of a source's distinct
    * (doc, 5-gram-shingle) occurrences whose shingle repeats across ≥25%
    * of that source's documents — headers, footers and templates show up
    * as exactly this inter-document repetition. Shingle work is the
    * shared `Dedup.charShingles` primitive (bounded explode, distinct
    * per doc); everything aggregates on (source, shingle) — no pairwise
    * doc comparison anywhere, so the profile stays linear at corpus
    * scale. The curation readout that says WHICH sources need template
    * stripping before dedup/training. */
  val qBoilerplate = Q(
    "q_boilerplate",
    """WITH sh AS (
      |  SELECT DISTINCT d.source, s.doc_id, s.shingle FROM (
      |    SELECT doc_id, substr(text, p, 5) AS shingle
      |    FROM documents, generate_series(1, 2000) t(p)
      |    WHERE p <= greatest(length(text) - 4, 1)) s
      |  JOIN documents d ON s.doc_id = d.doc_id),
      |nd AS (
      |  SELECT source, count(DISTINCT doc_id) AS n_docs FROM sh
      |  GROUP BY source),
      |df AS (
      |  SELECT source, shingle, count(*) AS df FROM sh GROUP BY 1, 2),
      |m AS (
      |  SELECT df.source, max(nd.n_docs) AS n_docs,
      |    count(*) AS n_shingles,
      |    sum(CASE WHEN df.df * 4 >= nd.n_docs THEN 1 ELSE 0 END)
      |      AS n_boiler,
      |    sum(df.df) AS n_occ,
      |    sum(CASE WHEN df.df * 4 >= nd.n_docs THEN df.df ELSE 0 END)
      |      AS boiler_occ
      |  FROM df JOIN nd ON df.source = nd.source
      |  GROUP BY df.source)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_shingles AS BIGINT) AS n_shingles,
      |  CAST(n_boiler AS BIGINT) AS n_boiler,
      |  ROUND(CAST(boiler_occ AS DOUBLE) / CAST(n_occ AS DOUBLE), 6)
      |    AS boiler_occ_share
      |FROM m ORDER BY source""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    val sh = graft.llm.Dedup.charShingles(
        docs.select("doc_id", "text"), k = 5, maxPos = 2000)
      .join(docs.select("doc_id", "source"), "doc_id")
    val nd = sh.groupBy("source")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val df = sh.groupBy("source", "shingle").agg(count(lit(1)).as("df"))
    df.join(broadcast(nd), "source")
      .groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") * 4 >= col("n_docs"), 1).otherwise(0))
          .as("n_boiler"),
        sum(col("df")).as("n_occ"),
        sum(when(col("df") * 4 >= col("n_docs"), col("df")).otherwise(0L))
          .as("boiler_occ"))
      .select(col("source"), col("n_docs").cast(LongType).as("n_docs"),
        col("n_shingles").cast(LongType).as("n_shingles"),
        col("n_boiler").cast(LongType).as("n_boiler"),
        round(col("boiler_occ").cast(DoubleType)
          / col("n_occ").cast(DoubleType), 6).as("boiler_occ_share"))
      .orderBy("source")
  }

  /** Novelty of the co-occurrence top-5 recommendations: mean
    * self-information −log2(item's order-share) of recommended items,
    * against the catalog mean — the long-tail exposure metric that
    * complements q_pop_bias's popularity lift (same candidate plumbing:
    * bounded per-order co-occurrence join, top-5 per item, never
    * all-pairs). Each item's bits term quantizes to ·10⁹ integers before
    * any sum (adamic-adar idiom), so the means are reduction-order-proof. */
  val qNoveltyRecs = Q(
    "q_novelty_recs",
    """WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |  GROUP BY a.l_partkey, b.l_partkey),
      |pop AS (
      |  SELECT l_partkey, count(DISTINCT l_orderkey) AS p
      |  FROM lineitem GROUP BY 1),
      |no AS (SELECT count(DISTINCT l_orderkey) AS n_ord FROM lineitem),
      |recs AS (
      |  SELECT pa, pb,
      |    row_number() OVER (PARTITION BY pa ORDER BY w DESC, pb) AS rk
      |  FROM pairs),
      |top5 AS (SELECT pa, pb FROM recs WHERE rk <= 5),
      |bits AS (
      |  SELECT t.pa, CAST(ROUND(
      |      -ln(CAST(pp.p AS DOUBLE) / no.n_ord) / ln(2) * 1000000000)
      |    AS BIGINT) AS b9
      |  FROM top5 t JOIN pop pp ON t.pb = pp.l_partkey, no),
      |cat AS (
      |  SELECT sum(CAST(ROUND(
      |      -ln(CAST(p AS DOUBLE) / no.n_ord) / ln(2) * 1000000000)
      |    AS BIGINT)) AS cb9, count(*) AS np
      |  FROM pop, no)
      |SELECT count(*) AS n_recs,
      |  ROUND(CAST(sum(b9) AS DOUBLE) / count(*) / 1000000000, 6)
      |    AS mean_novelty_bits,
      |  ROUND(CAST(max(c.cb9) AS DOUBLE) / max(c.np) / 1000000000, 6)
      |    AS catalog_novelty_bits
      |FROM bits CROSS JOIN cat c""".stripMargin) { (s, d) =>
    val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
    val pairs = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
      .join(li.select(col("l_orderkey").as("ok2"),
        col("l_partkey").as("pb")),
        col("l_orderkey") === col("ok2") && col("pa") =!= col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
    val pop = li.groupBy("l_partkey")
      .agg(countDistinct(col("l_orderkey")).as("p"))
    val no = li.agg(countDistinct(col("l_orderkey")).as("n_ord"))
    val w = Window.partitionBy("pa").orderBy(col("w").desc, col("pb"))
    val top5 = pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select("pa", "pb")
    val bits = top5
      .join(pop.withColumnRenamed("l_partkey", "pk"), col("pb") === col("pk"))
      .crossJoin(broadcast(no))
      .select(round(-log(col("p").cast(DoubleType)
          / col("n_ord")) / math.log(2.0) * 1000000000L)
        .cast(LongType).as("b9"))
    val cat = pop.crossJoin(broadcast(no))
      .agg(sum(round(-log(col("p").cast(DoubleType)
            / col("n_ord")) / math.log(2.0) * 1000000000L)
          .cast(LongType)).as("cb9"),
        count(lit(1)).as("np"))
    bits.crossJoin(broadcast(cat))
      .agg(count(lit(1)).as("n_recs"),
        round(sum(col("b9")).cast(DoubleType) / count(lit(1))
          / 1000000000L, 6).as("mean_novelty_bits"),
        round(max(col("cb9")).cast(DoubleType) / max(col("np"))
          / 1000000000L, 6).as("catalog_novelty_bits"))
  }

  /** Retention-policy sweep: rows per event type older than a 90-day
    * window behind the table's global high-water mark — the deletion
    * blast radius a GDPR/TTL compaction job plans with BEFORE rewriting
    * files (complements q_erasure_audit's per-user view and
    * q_compaction_plan's file packing). One scan + one broadcast
    * watermark row; all cutoff arithmetic on exact µs integers. */
  val qRetentionSweep = Q(
    "q_retention_sweep",
    """WITH hw AS (SELECT max(epoch_us(ts)) AS wm_us FROM events),
      |x AS (
      |  SELECT event_type,
      |    CASE WHEN epoch_us(ts) < wm_us - 7776000000000
      |      THEN 1 ELSE 0 END AS expired
      |  FROM events, hw)
      |SELECT event_type, count(*) AS n_rows,
      |  CAST(sum(expired) AS BIGINT) AS n_expired,
      |  ROUND(CAST(sum(expired) AS DOUBLE) / count(*), 6)
      |    AS expired_share
      |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, d) =>
    val ev = t(s, d, "events").select(col("event_type"),
      unix_micros(col("ts").cast(TimestampType)).as("us"))
    val hw = ev.agg(max(col("us")).as("wm_us"))
    ev.crossJoin(broadcast(hw))
      .select(col("event_type"),
        when(col("us") < col("wm_us") - 7776000000000L, 1).otherwise(0)
          .as("expired"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("expired")).cast(LongType).as("n_expired"),
        round(sum(col("expired")).cast(DoubleType) / count(lit(1)), 6)
          .as("expired_share"))
      .orderBy("event_type")
  }

  /** MLM masking plan audit: deterministic 15% token masking (mask iff
    * md5(doc_id:pos) mod 100 < 15 — the seeded-PRNG house pattern, so
    * the plan is reproducible run-over-run and auditable before any
    * training job), summarized per source. The pre-training check that
    * the masking rate actually lands near the configured rate per slice
    * and no source is systematically under-masked. Linear explode over
    * token positions; everything aggregates on source. */
  val qMaskPlan = Q(
    "q_mask_plan",
    """WITH tok AS (
      |  SELECT d.source, d.doc_id,
      |    len(string_split(d.text, ' ')) AS n_tok
      |  FROM documents d),
      |pos AS (
      |  SELECT source, doc_id, p,
      |    CASE WHEN CAST(concat('0x',
      |        substr(md5(concat(doc_id, ':', p)), 1, 15)) AS BIGINT)
      |      % 100 < 15 THEN 1 ELSE 0 END AS m
      |  FROM tok, generate_series(1, 4000) t(p)
      |  WHERE p <= n_tok)
      |SELECT source, count(DISTINCT doc_id) AS n_docs,
      |  count(*) AS n_tokens, CAST(sum(m) AS BIGINT) AS n_masked,
      |  ROUND(CAST(sum(m) AS DOUBLE) / count(*), 6) AS mask_rate
      |FROM pos GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val tok = t(s, d, "documents").select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).as("n_tok"))
    val pos = tok.select(col("source"), col("doc_id"),
        explode(sequence(lit(1), least(col("n_tok"), lit(4000)))).as("p"))
      .select(col("source"), col("doc_id"),
        when(conv(substring(md5(concat(col("doc_id"), lit(":"), col("p"))),
          1, 15), 16, 10).cast(LongType) % 100 < 15, 1).otherwise(0)
          .as("m"))
    pos.groupBy("source")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(col("m")).cast(LongType).as("n_masked"),
        round(sum(col("m")).cast(DoubleType) / count(lit(1)), 6)
          .as("mask_rate"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(qBoilerplate, qNoveltyRecs, qRetentionSweep,
    qMaskPlan)
}
