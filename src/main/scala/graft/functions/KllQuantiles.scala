package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable QUANTILE sketches (Datasketches KLL) — the rank/percentile
  * twin of the HLL distinct-count rollup in `q_agg_hll_merge`: persist a
  * few-KB sketch per partition/day/group, answer any coarser grouping's
  * percentiles later by MERGING sketches, never rescanning the raw data.
  * `approx_percentile` alone can't do this — its sketch never leaves the
  * aggregation that built it.
  *
  * Build shape: per-partition sketches via `mapPartitions` with a plain
  * object map (one heap sketch per group per partition, updated in place),
  * NOT a row-at-a-time `Aggregator` — a binary-buffered Aggregator would
  * re-serialize the ~2 KB sketch on every row through the hash-agg row
  * buffer, turning a linear pass into allocation churn. The partial output
  * is |groups × partitions| rows of bytes; the merge aggregator then runs
  * over that tiny frame, where per-row heapify cost is irrelevant.
  */
object KllQuantiles {

  /** Merge serialized KLL sketches (associative + commutative — safe for
    * map-side partial aggregation at any nesting). */
  object KllMergeAggregator
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def heap(b: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(b))
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
      merge(buf, in)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else { val s = heap(a); s.merge(heap(b)); s.toByteArray }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** One serialized KLL sketch per (key, input partition): a single pass,
    * object state in a hash map, no per-row serialization. Output is the
    * mergeable partial — group it and fold with [[KllMergeAggregator]]. */
  def partitionSketches(df: DataFrame, keyCol: String, valCol: String,
      k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("string"), col(valCol).cast("double"))
      .as[(String, Double)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
        it.foreach { case (key, v) =>
          m.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k)).update(v)
        }
        m.iterator.map { case (key, sk) => (key, sk.toByteArray) }
      }
      .toDF(keyCol, "sketch")
  }

  /** Quantile estimate from a serialized sketch (inclusive rank search,
    * returns a retained stream item). */
  def estimate(bytes: Array[Byte], rank: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getQuantile(rank)
}
