package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gram_count_explode(tokens, w)`: one row per DISTINCT token `w`-gram
  * of a document with its md5 hex hash and within-doc occurrence count
  * — the per-document gram-count-index row, computed inside the row.
  *
  * Why a Generator and not gram positions + `groupBy(gh, doc_id)`: the
  * grouping key (gram hash, doc_id) is nearly unique per position row
  * for natural text (a 10-gram rarely repeats WITHIN a doc), so the
  * aggregation's exchange ships one row per gram POSITION — the same
  * combined-nothing smell [[PostingExplode]] killed in the postings
  * build (NOTES r19: 401 of 507 MiB), here owning the gram-index
  * build's first of two full-position exchanges. A document's grams
  * all live in its own row, so the count needs no exchange at all:
  * this generator folds each doc's gram→count map in one pass, and the
  * gram-index build's only remaining exchange is the 64-bucket layout
  * repartition.
  *
  * Output is bit-equal to `groupBy(gh, doc_id).agg(count(1) AS cnt)`
  * over the positional form `explode(transform(sequence(1, n - w + 1),
  * i -> md5(array_join(slice(toks, i, w), ' '))))` — `gh` is the
  * lowercase md5 hex of the UTF-8 bytes of the space-joined gram
  * (null tokens skipped, matching `array_join`), rows come out in
  * first-occurrence order, a doc with fewer than `w` tokens (or a NULL
  * array) emits nothing. SpanIndexSpec pins the equivalence over the
  * fixture corpus plus planted repeat/short/empty docs.
  *
  * Reference note: the reference's per-line fan-out
  * (projectAdler Manager.java:279-283) is the closest analog of a
  * generator; this one fans out to the distinct-gram count.
  */
case class GramCountExplode(child: Expression, width: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, width)

  override def elementSchema: StructType = StructType(Seq(
    StructField("gh", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, width.dataType, width.foldable) match {
      case (ArrayType(StringType, _), IntegerType, true) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, wd, f) => TypeCheckResult.TypeCheckFailure(
        s"gram_count_explode expects (ARRAY<STRING>, foldable INT), got " +
          s"(${c.sql}, ${wd.sql}${if (f) "" else ", non-foldable"})")
    }

  @transient private lazy val w: Int = {
    val v = width.eval(null).asInstanceOf[Int]
    require(v >= 1, s"gram_count_explode width must be >= 1, got $v")
    v
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < w) Iterator.empty
      else {
        // token bytes materialized once per doc (getUTF8String returns a
        // view into the row buffer — copy via getBytes before reuse)
        val toks = new Array[Array[Byte]](n)
        var i = 0
        while (i < n) {
          toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
          i += 1
        }
        val md = java.security.MessageDigest.getInstance("MD5")
        // insertion-ordered so output order is deterministic
        // (first-occurrence order, like the displaced groupBy's input)
        val acc = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
        var s = 0
        while (s + w <= n) {
          // space-joined gram bytes, null tokens skipped — array_join
          // semantics, so gh is bit-equal to the positional form's md5
          md.reset()
          var first = true
          var j = s
          while (j < s + w) {
            if (toks(j) != null) {
              if (!first) md.update(' '.toByte)
              md.update(toks(j))
              first = false
            }
            j += 1
          }
          val hex = new Array[Byte](32)
          val dig = md.digest()
          var k = 0
          while (k < 16) {
            val b = dig(k) & 0xff
            hex(2 * k) = GramCountExplode.HexDigits(b >>> 4)
            hex(2 * k + 1) = GramCountExplode.HexDigits(b & 0xf)
            k += 1
          }
          val gh = UTF8String.fromBytes(hex)
          val cur = acc.get(gh)
          if (cur == null) acc.put(gh, Array(1L)) else cur(0) += 1L
          s += 1
        }
        val it = acc.entrySet().iterator()
        new Iterator[InternalRow] {
          def hasNext: Boolean = it.hasNext
          def next(): InternalRow = {
            val e = it.next()
            InternalRow(e.getKey, e.getValue()(0))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), width = newChildren(1))
}

object GramCountExplode {
  private val HexDigits: Array[Byte] = "0123456789abcdef".getBytes("US-ASCII")

  /** Session-local registration (idempotent). */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_count_explode", exprs => GramCountExplode(exprs(0), exprs(1)),
      "built-in")
}
