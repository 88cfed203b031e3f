package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k (score, id) selector as a typed Aggregator — the
  * scalable alternative to `row_number().over(Window.partitionBy(key))`
  * for per-key top-k over a CANDIDATE-heavy stream: a window must first
  * shuffle every candidate row to its key's reducer, while this
  * aggregator partial-aggregates map-side, so only |keys| × k survivors
  * ever reach the exchange. That is the difference between shuffling
  * billions of scored (user, item) candidates and shuffling three
  * winners per user at 100 TB.
  *
  * Determinism: ordering is (score DESC, id ASC) — the same total order
  * at every buffer size, so the result is reduction-order-independent.
  * The buffer is a size-≤k sorted Vector; a candidate that doesn't beat
  * the current kth is rejected with one comparison and zero allocation
  * (the overwhelmingly common case on a large candidate stream).
  */
class TopKPairs(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)],
      x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      val i = buf.indexWhere(b => beats(x, b)) match {
        case -1 => buf.size
        case j  => j
      }
      val ins = (buf.take(i) :+ x) ++ buf.drop(i)
      if (ins.size > k) ins.take(k) else ins
    }

  /** Merge two sorted buffers: linear merge, keep the k best. */
  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && beats(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
