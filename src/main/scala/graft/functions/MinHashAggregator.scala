package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the engine's UDAF surface,
  * `Aggregator[IN, BUF, OUT]`): folds a document's tokens into its 8-slot
  * MinHash signature.
  *
  * Semantically identical to the built-in-expression MinHash path in
  * [[graft.operators.Dedup]] (same md5(token || '#' || h) hash family), so
  * the DuckDB oracle checks it exactly. The buffer is the element-wise
  * minimum — associative and commutative, so Spark can partial-aggregate
  * map-side and merge across partitions, which is what makes a custom
  * sketch scale: state is O(slots), never O(rows).
  */
object MinHashAggregator extends Aggregator[(Long, String), Seq[String], String] {

  private val Slots = 8
  /** lexicographically above every md5 hex digest */
  private val Sentinel = "￿"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  override def zero: Seq[String] = Seq.fill(Slots)(Sentinel)

  override def reduce(buf: Seq[String], in: (Long, String)): Seq[String] = {
    val a = buf.toArray
    var h = 0
    while (h < Slots) {
      val v = md5hex(in._2 + "#" + h)
      if (v < a(h)) a(h) = v
      h += 1
    }
    a.toSeq
  }

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    a.lazyZip(b).map((x, y) => if (y < x) y else x)

  override def finish(r: Seq[String]): String = r.mkString(",")

  // Catalyst-native buffer encoding (an array of strings in the agg
  // buffer) — a kryo-blob buffer serialized ~8x slower here
  override def bufferEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
