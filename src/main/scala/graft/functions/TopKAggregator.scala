package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
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
  * Buffer is a plain descending-sorted array (k is small); merge is a
  * bounded merge of two sorted arrays.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], in: (Double, Long)): Array[(Double, Long)] =
    merge(buf, Array(in))

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Array[(Double, Long)]): Seq[(Double, Long)] = r.toSeq

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    Encoders.kryo[Array[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
