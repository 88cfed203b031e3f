package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer training and encoding over a corpus —
  * the "token counting (BPE-ish)" north-star capability taken from a
  * counting heuristic to the real merge-learning algorithm.
  *
  * Scale shape (the reason BPE fits Spark well): merges are learned over
  * the DISTINCT-WORD table weighted by word frequency, not over raw
  * tokens — the working set is the vocabulary (bounded, ~10^6 for web
  * corpora) however many trillions of tokens the corpus holds. One
  * corpus-sized aggregation builds that table; afterwards each merge
  * iteration is (a) one pair-count aggregate over the vocabulary and (b)
  * one narrow map applying the merge — no corpus rescan, no shuffle of
  * anything proportional to corpus size. The driver holds only the
  * winning (pair, count) row per iteration (the SkewJoin hot-key
  * posture).
  *
  * Determinism: the winning pair maximizes (count, then lexicographic
  * (left, right) ascending) — a total order, so training is reproducible
  * across engines and partitionings. Merging within a word is the
  * standard greedy left-to-right pass (a fresh merged symbol does not
  * re-merge with the following token in the same pass), expressed as a
  * codegen-friendly `aggregate` HOF over the symbol array.
  */
object Bpe {

  /** One merge rule: (left symbol, right symbol) → left+right. */
  final case class Merge(left: String, right: String)

  /** The distinct-word working set: (word, cnt). */
  def wordTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial segmentation: one symbol per character. */
  private def charSplit(word: Column): Column =
    filter(split(word, ""), c => length(c) > 0)

  /** Greedy left-to-right application of ONE merge to a symbol array:
    * fold symbols into an accumulator, fusing when the accumulator's last
    * element is `left` and the incoming symbol is `right`. */
  private def applyMerge(syms: Column, m: Merge): Column = {
    val fused = lit(m.left + m.right)
    aggregate(
      syms,
      array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(m.left) && x === lit(m.right),
          concat(slice(acc, lit(1), size(acc) - 1), array(fused)))
          .otherwise(concat(acc, array(x))))
  }

  /** Adjacent-pair counts over the symbolized word table, weighted by
    * word frequency — the per-iteration aggregate, bounded by the
    * vocabulary's total symbol count. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      // CASE guard: sequence(1, 0) DESCENDS in Spark, so a 1-symbol word
      // would enumerate index 2 and throw instead of yielding no pairs
      .select(col("cnt"), explode(expr(
        """CASE WHEN size(syms) < 2
          |THEN cast(array() as array<struct<l: string, r: string>>)
          |ELSE transform(sequence(1, size(syms) - 1),
          |  i -> struct(element_at(syms, i) AS l,
          |              element_at(syms, i + 1) AS r)) END""".stripMargin))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("n"))

  /** Learn `numMerges` merge rules from the corpus. Returns the rules in
    * application order (possibly fewer than requested if the vocabulary
    * runs out of adjacent pairs). */
  def train(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[Merge] = {
    var words = wordTable(docs, textCol)
      .select(charSplit(col("word")).as("syms"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1))
        merges += m
        // localCheckpoint truncates the per-iteration lineage so the plan
        // stays one merge deep (same guard as LabelProp.run)
        words = words
          .select(applyMerge(col("syms"), m).as("syms"), col("cnt"))
          .localCheckpoint()
      }
      i += 1
    }
    merges.result()
  }

  /** Segment every distinct word of the corpus with the learned merges:
    * (word, syms ARRAY<STRING>, cnt). Encoding a corpus then means
    * joining its tokens to this bounded table — tokens shuffle once on
    * the word key, the segmentation itself never rescans the corpus. */
  def segmentWords(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): DataFrame = {
    val base = wordTable(docs, textCol)
      .select(col("word"), charSplit(col("word")).as("syms"), col("cnt"))
    merges.foldLeft(base) { (df, m) =>
      df.select(col("word"), applyMerge(col("syms"), m).as("syms"),
        col("cnt"))
    }
  }

  /** Per-document BPE token counts: join each doc's tokens to the
    * segmented vocabulary and sum symbol counts — char count as the
    * no-merge upper bound sanity column. */
  def encodeCounts(docs: DataFrame, merges: Seq[Merge],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val segs = segmentWords(docs, merges, textCol)
      .select(col("word"), size(col("syms")).as("n_syms"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(segs, "word")
      .groupBy(idCol)
      .agg(sum(col("n_syms")).cast(LongType).as("n_bpe_tokens"),
        sum(length(col("word"))).cast(LongType).as("n_chars"))
  }
}
