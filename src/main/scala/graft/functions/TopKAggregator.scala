package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator (typed Aggregator): keeps the k best
  * (score DESC, id ASC) pairs per group.
  *
  * This is the scalable alternative to `row_number().over(window) <= k`:
  * the window plan shuffles and fully sorts every partition of every
  * group, while this aggregator's state is O(k) per group and Spark
  * partial-aggregates it map-side — at 100 TB the shuffle carries k rows
  * per group instead of all of them. (The window form stays in the
  * catalog as q_window_rank; q_topk_per_group is oracle-checked to
  * produce identical results.)
  *
  * The buffer is a descending-sorted array, Catalyst-encoded (array of
  * struct — a kryo blob buffer deserializes ~8x slower). `reduce` is the
  * per-row hot path: early-exit when the row can't place, else binary-
  * search + single arraycopy insert — the previous concat+sort per row was
  * the 15 s vs 5 s gap against the custom physical operator
  * ([[graft.plans.TopKPerGroupPlan]], which uses the same insert).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], in: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length >= k && !better(in, buf(buf.length - 1))) return buf
    // binary search for the insert slot in the desc-sorted buffer
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(buf(mid), in)) lo = mid + 1 else hi = mid
    }
    val outLen = math.min(buf.length + 1, k)
    val out = new Array[(Double, Long)](outLen)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = in
    if (lo + 1 < outLen) System.arraycopy(buf, lo, out, lo + 1, outLen - lo - 1)
    out
  }

  /** Merge of two desc-sorted arrays, capped at k — runs once per map-side
    * partial per group, not per row. */
  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val outLen = math.min(a.length + b.length, k)
    val out = new Array[(Double, Long)](outLen)
    var i = 0
    var j = 0
    var o = 0
    while (o < outLen) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) { out(o) = a(i); i += 1 }
      else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(r: Array[(Double, Long)]): Seq[(Double, Long)] = r.toSeq

  override def bufferEncoder: Encoder[Array[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
