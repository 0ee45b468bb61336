package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the engine's UDAF surface,
  * `Aggregator[IN, BUF, OUT]`): folds a document's tokens into its
  * `slots`-wide MinHash signature. The width is the LSH geometry's
  * bands × rowsPerBand product ([[graft.operators.Dedup]] reads it from
  * `spark.graft.lsh.bands` / `.rowsPerBand`); the companion object is
  * the oracle-pinned 8-slot default.
  *
  * Semantically identical to the built-in-expression MinHash path in
  * [[graft.operators.Dedup]] (same md5(token || '#' || h) hash family,
  * h rendered in DECIMAL so slot 10+ matches the oracle's
  * `CAST(h AS VARCHAR)`), so the DuckDB oracle checks it exactly. The
  * buffer is the element-wise minimum — associative and commutative, so
  * Spark can partial-aggregate map-side and merge across partitions,
  * which is what makes a custom sketch scale: state is O(slots), never
  * O(rows).
  *
  * Hot-path discipline (this runs once per token): one thread-local
  * MessageDigest reused across calls (`getInstance` per call was 8 allocs/
  * token), one UTF-8 encode per token with the slot suffix bytes
  * PRECOMPUTED at construction and streamed via `update()`, table-driven
  * hex (replacing 128 `String.format` calls per token), and an in-place
  * Array buffer (the Aggregator contract permits mutating and returning
  * the buffer).
  */
class MinHashAggregator(slots: Int)
    extends Aggregator[(Long, String), Array[String], String] {
  import MinHashAggregator._

  require(slots >= 1, s"MinHash signature width must be >= 1, got $slots")

  // decimal digits of each slot index, encoded once — reduce() streams
  // them after the '#' so h >= 10 hashes exactly like the oracle's
  // md5(token || '#' || CAST(h AS VARCHAR))
  private val slotSuffix: Array[Array[Byte]] =
    Array.tabulate(slots)(h => h.toString.getBytes(StandardCharsets.US_ASCII))

  override def zero: Array[String] = Array.fill(slots)(Sentinel)

  override def reduce(buf: Array[String], in: (Long, String)): Array[String] = {
    val md = digests.get()
    val tokenBytes = in._2.getBytes(StandardCharsets.UTF_8)
    var h = 0
    while (h < slots) {
      // md5(token || '#' || h) without materializing the suffixed string
      md.reset()
      md.update(tokenBytes)
      md.update('#'.toByte)
      md.update(slotSuffix(h))
      val v = hex32(md.digest())
      if (v < buf(h)) buf(h) = v
      h += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < slots) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[String]): String = r.mkString(",")

  // Catalyst-native buffer encoding (an array of strings in the agg
  // buffer) — a kryo-blob buffer serialized ~8x slower here
  override def bufferEncoder: Encoder[Array[String]] = ExpressionEncoder()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** The oracle-pinned default instance (8 slots = 2 bands × 4 rows) plus
  * the shared per-JVM hashing statics. */
object MinHashAggregator extends MinHashAggregator(8) {

  /** lexicographically above every md5 hex digest */
  private[functions] val Sentinel = "￿"

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".toCharArray

  private def hex32(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
