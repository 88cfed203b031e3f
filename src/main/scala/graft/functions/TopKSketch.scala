package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters sketch (Metwally et al., ICDT 2005) as a
  * typed Aggregator: a bounded map of `capacity` counters that partial-
  * aggregates map-side and merges associatively — the whole token stream
  * reduces to one `capacity`-sized buffer per partition, so finding the
  * frequent terms of a 100 TB corpus costs one narrow shuffle of
  * constant-size sketches (vs a full groupBy over the vocabulary).
  *
  * Guarantees (standard for space-saving): estimated count ≥ true count;
  * any item with true frequency > n / capacity is present in the sketch.
  * `finish` returns the counters sorted by (estimate desc, item asc) so
  * downstream consumption is deterministic.
  */
class TopKSketch(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None =>
        // evict the minimum counter; the newcomer inherits its count + 1
        val (minK, minC) = buf.minBy { case (k, c) => (c, k) }
        (buf - minK).updated(item, minC + 1L)
    }

  /** Overestimate-preserving merge (mergeable-summaries form): a key
    * absent from a FULL sketch has true count ≤ that sketch's min
    * counter, so the absent side contributes that bound (0 if the sketch
    * never evicted — then absent really means unseen). The union then
    * trims back to the `capacity` largest. */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val aErr = if (a.size >= capacity) a.values.min else 0L
    val bErr = if (b.size >= capacity) b.values.min else 0L
    val summed = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, aErr) + b.getOrElse(k, bErr)))
      .toMap
    if (summed.size <= capacity) summed
    else summed.toSeq
      .sortBy { case (k, c) => (-c, k) }
      .take(capacity).toMap
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
