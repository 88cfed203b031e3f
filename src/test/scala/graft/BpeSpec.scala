package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._

/** BPE training/encoding semantics: exact merge sequences on
  * hand-computed corpora, deterministic tie-breaking, greedy
  * left-to-right within-word merging, encode-count invariants, and
  * parallelism invariance of the learned rules. */
class BpeSpec extends SparkTestBase {

  import org.apache.spark.sql.DataFrame

  private def corpus(texts: String*): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("merge sequence matches the hand computation") {
    // words: ab x3, abc x1 → pair (a,b) count 4 wins; then (ab,c) count 1
    val docs = corpus("ab ab ab", "abc")
    val merges = Bpe.train(docs, 2)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b"), ("ab", "c")))
  }

  test("equal-count ties break lexicographically on (left, right)") {
    val docs = corpus("ab cd ab cd")
    val merges = Bpe.train(docs, 2)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b"), ("c", "d")))
  }

  test("greedy left-to-right: 'aaa' merges once under rule (a,a)") {
    // pair (a,a) appears twice in "aaa" but the standard greedy pass
    // fuses the FIRST occurrence only: [aa, a], never [a, aa] or [aaa]
    val docs = corpus("aaa")
    val merges = Bpe.train(docs, 1)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "a")))
    val segs = Bpe.segmentWords(docs, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(segs("aaa") == Seq("aa", "a"))
  }

  test("encodeCounts: frequent words compress, counts bounded by chars") {
    val docs = corpus("lower lower lower lowest", "lower lowest low")
    val merges = Bpe.train(docs, 8)
    val out = Bpe.encodeCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 1 <= bpe tokens <= chars for every doc
    out.values.foreach { case (bpe, chars) =>
      assert(bpe >= 1 && bpe <= chars)
    }
    // after 8 merges the dominant word 'lower' is a single symbol, so
    // doc 0 (3x lower + lowest) encodes well below its char count
    val segs = Bpe.segmentWords(docs, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(segs("lower").length == 1, s"lower -> ${segs("lower")}")
  }

  test("learned rules are invariant to shuffle parallelism") {
    val docs = Tables.load(spark, sf, "documents").limit(120)
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "5")
      val a = Bpe.train(docs, 5)
      conf.set("spark.sql.shuffle.partitions", "13")
      val b = Bpe.train(docs, 5)
      assert(a == b && a.length == 5)
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("q_bpe_train returns ranked merges over the fixture corpus") {
    val rows = operators.LlmQueries.qBpeTrain.run(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
    }
  }
}
