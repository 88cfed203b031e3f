package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM 2002) as a typed Aggregator: keep the `k` smallest DISTINCT
  * hash values seen; with hashes uniform on [0, 2^60) the k-th minimum
  * h_k yields the estimate (k−1)·2^60/h_k. The buffer is a bounded
  * sorted list, so the sketch partial-aggregates map-side and merges
  * associatively — distinct-counting a 100 TB table costs one narrow
  * shuffle of k-sized buffers, never a shuffle of the distinct values
  * themselves (the scalable replacement for the windowed bottom-k that
  * a rank-based formulation would need).
  *
  * Unlike HLL, the result is DETERMINISTIC given a deterministic hash
  * (here: 60-bit md5 prefixes computed in the plan), which is what puts
  * `q_kmv_distinct` under the DuckDB oracle gate — the oracle reproduces
  * the exact same k minima by sorting. Merge is exact set semantics:
  * union, dedup, keep k smallest — so any partitioning and any merge
  * tree produce identical buffers.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.contains(h)) buf
    else if (buf.size < k) (buf :+ h).sorted
    else if (h < buf.last) ((buf :+ h).sorted).take(k)
    else buf

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** The ascending k minima (fewer if the input had < k distinct values). */
  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
