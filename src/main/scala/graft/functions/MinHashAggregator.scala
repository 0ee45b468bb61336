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
object MinHashAggregator extends Aggregator[(Long, String), Array[String], String] {

  private val Slots = 8
  /** lexicographically above every md5 hex digest */
  private val Sentinel = "￿"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  override def zero: Array[String] = Array.fill(Slots)(Sentinel)

  override def reduce(buf: Array[String], in: (Long, String)): Array[String] = {
    var h = 0
    while (h < Slots) {
      val v = md5hex(in._2 + "#" + h)
      if (v < buf(h)) buf(h) = v
      h += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var h = 0
    while (h < Slots) { if (b(h) < a(h)) a(h) = b(h); h += 1 }
    a
  }

  override def finish(r: Array[String]): String = r.mkString(",")

  override def bufferEncoder: Encoder[Array[String]] = Encoders.kryo[Array[String]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
