package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator custom plan (SURVEY.md §7.3 tier (c)): top-k rows per
  * group, selected by (score DESC, tie ASC).
  *
  * Spark's built-in route — `row_number().over(Window...)` + filter —
  * must SORT every group's full row set inside each partition before it
  * can rank. This operator declares `ClusteredDistribution(group)` (so
  * Catalyst inserts exactly one hash exchange) and then keeps a bounded
  * k-buffer per group in a single pass: O(n·log k) work, O(groups·k)
  * memory, no sort buffer. At 100 TB with millions of groups the
  * difference between "sort everything" and "keep k per group" is the job.
  *
  * Memory safety: O(groups·k) is still unbounded in the number of DISTINCT
  * keys per partition, so the buffer map carries a row budget
  * (`spark.graft.topkPerGroup.maxBufferedRows`, default 4M). On overflow
  * the map is drained to a key-sorted spill run on disk and rebuilt; runs
  * are k-way merged by key at the end (each run holds a PARTIAL top-k per
  * key — top-k is a semilattice, so merging partials is exact). Spill
  * activity is observable via the `numSpills`/`spilledRows` SQL metrics.
  *
  * Null ordering matches the window form's `desc_nulls_last` / tie
  * `asc_nulls_last`: null scores lose to every non-null score and surface
  * only in groups with fewer than k non-null rows.
  *
  * The logical node carries resolved attributes; the strategy lowers it
  * to the exec node; `EnsureRequirements` provides the exchange (and AQE
  * can still re-plan it).
  */
case class TopKPerGroup(group: Expression, score: Expression, tie: Expression,
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Planner strategy: lowers the logical node (register via
  * `spark.experimental.extraStrategies` or an extensions injection). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, s, t, k, child) =>
      TopKPerGroupExec(g, s, t, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Public API for the custom operator. */
object TopKPerGroupOp {
  import org.apache.spark.sql.DataFrame

  /** Wrap `df` in the custom top-k-per-group operator. Columns are
    * resolved by name against the analyzed plan and TYPE-CHECKED here —
    * at analysis time, not as a task-side MatchError: score must be
    * DOUBLE, tie must be integral. The strategy is registered
    * idempotently on the session. */
  /** Idempotently register the planner strategy AND the window-idiom
    * rewrite rule ([[TopKRewriteRule]]) on a session — the programmatic
    * twin of wiring [[graft.GraftExtensions]]. */
  def ensureRegistered(s: org.apache.spark.sql.SparkSession): Unit = {
    val cs = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      cs.experimental.extraStrategies =
        TopKPerGroupStrategy +: cs.experimental.extraStrategies
    if (!cs.experimental.extraOptimizations.contains(TopKRewriteRule))
      cs.experimental.extraOptimizations =
        TopKRewriteRule +: cs.experimental.extraOptimizations
  }

  def topK(df: DataFrame, groupCol: String, scoreCol: String, tieCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      cs.experimental.extraStrategies =
        TopKPerGroupStrategy +: cs.experimental.extraStrategies
    val lp = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${lp.output.map(_.name)}"))
    val (grp, score, tie) = (attr(groupCol), attr(scoreCol), attr(tieCol))
    // Spill runs sort group keys via Comparable — array/struct/map/binary
    // keys would only fail at task time under memory pressure, so reject
    // them here, at analysis time, like the score/tie checks.
    grp.dataType match {
      case org.apache.spark.sql.types.StringType | LongType | IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType | DoubleType |
           org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType |
           (_: org.apache.spark.sql.types.DecimalType) => ()
      case other => throw new IllegalArgumentException(
        s"group column $groupCol must be an atomic comparable type " +
          s"(spill runs sort keys), got ${other.sql}")
    }
    // integer scores widen to Double at extraction — exact below 2^53,
    // which covers every q6 fixed-point score in the engine; ties beyond
    // that would fall to the tie column (documented, not reachable here)
    if (score.dataType != DoubleType && score.dataType != LongType &&
        score.dataType != IntegerType)
      throw new IllegalArgumentException(
        s"score column $scoreCol must be DOUBLE, BIGINT or INT, " +
          s"got ${score.dataType.sql}")
    if (tie.dataType != LongType && tie.dataType != IntegerType)
      throw new IllegalArgumentException(
        s"tie column $tieCol must be BIGINT or INT, got ${tie.dataType.sql}")
    org.apache.spark.sql.classic.GraftBridge.ofRows(cs,
      TopKPerGroup(grp, score, tie, k, lp))
  }
}

case class TopKPerGroupExec(group: Expression, score: Expression, tie: Expression,
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** One hash exchange on the group key; no ordering requirement — the
    * whole point is to never sort the full input. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(group)) :: Nil

  override lazy val metrics = Map(
    "numSpills" -> SQLMetrics.createMetric(sparkContext, "number of spills"),
    "spilledRows" -> SQLMetrics.createMetric(sparkContext, "spilled buffer rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    import TopKPerGroupExec.{Entry, better, keyOrd}
    val gBound = BindReferences.bindReference(group, child.output)
    val sBound = BindReferences.bindReference(score, child.output)
    val tBound = BindReferences.bindReference(tie, child.output)
    val kLocal = k
    val nFields = child.output.length
    val types = child.output.map(_.dataType).toArray
    // physical-plan context (SQLConf, no SparkSession) — parse locally
    // with the same fail-fast conf-naming contract as graft.GraftConf
    val budget =
      try conf.getConfString(
        "spark.graft.topkPerGroup.maxBufferedRows", "4000000").trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          "spark.graft.topkPerGroup.maxBufferedRows must be an integer")
      }
    // The k-way merge phase re-uses insert() with spilling disabled; a
    // budget below k could otherwise trigger a mid-merge writeRun whose
    // rows no Run would ever read back — silent data loss. Fail loudly.
    require(budget >= k,
      s"spark.graft.topkPerGroup.maxBufferedRows ($budget) must be >= k ($k)")
    val numSpills = longMetric("numSpills")
    val spilledRows = longMetric("spilledRows")

    child.execute().mapPartitions { iter =>
      val buffers = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.ArrayBuffer[Entry]]
      var retained = 0L
      val spillFiles = scala.collection.mutable.ArrayBuffer.empty[File]
      lazy val toUnsafe = UnsafeProjection.create(types)

      def writeRun(): Unit = {
        val f = File.createTempFile("graft-topk-spill", ".bin")
        f.deleteOnExit()
        val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f)))
        try {
          buffers.toArray.sortBy(_._1)(keyOrd).foreach { case (_, buf) =>
            buf.foreach { case (_, _, _, row) =>
              val ur = row match {
                case u: UnsafeRow => u
                case r => toUnsafe(r)
              }
              val bytes = ur.getBytes
              out.writeInt(bytes.length)
              out.write(bytes)
            }
          }
        } finally out.close()
        spillFiles += f
        numSpills += 1
        spilledRows += retained
        buffers.clear()
        retained = 0
      }

      def insert(rowIn: InternalRow, copyRow: Boolean, allowSpill: Boolean): Unit = {
        val rawKey = gBound.eval(rowIn)
        // iterator rows are reused backing buffers — copy anything retained
        val key = rawKey match {
          case u: UTF8String => u.copy()
          case x => x
        }
        val svRaw = sBound.eval(rowIn)
        val ns = svRaw == null
        val sv = svRaw match {
          case null                 => 0.0
          case d: java.lang.Double  => d.doubleValue()
          case l: java.lang.Long    =>
            // Double widening is exact below 2^53; above it, distinct Long
            // scores collapse into EQUAL doubles and the heap can keep the
            // wrong row — mis-ordering, not tie-breaking. The q6 envelopes
            // upstream keep scores far below this, but they are corpus-
            // size-dependent claims, so enforce the boundary here: fail
            // loudly instead of silently mis-ranking.
            val v = l.longValue()
            if (v > (1L << 53) || v < -(1L << 53))
              throw new IllegalStateException(
                s"TopKPerGroup: integer score $v exceeds 2^53 — Double " +
                  "widening would mis-order; rescale the score column " +
                  "(see the BM25 q6 overflow-bounds recipe)")
            v.toDouble
          case i: java.lang.Integer => i.toDouble
        }
        val tv = tBound.eval(rowIn) match {
          case null => Long.MaxValue // tie asc_nulls_last
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
        }
        val buf = buffers.getOrElseUpdate(key,
          new scala.collection.mutable.ArrayBuffer[Entry](kLocal + 1))
        val full = buf.length >= kLocal
        val worseThanLast = full && {
          val (lns, ls, lt, _) = buf.last
          !better(ns, sv, tv, lns, ls, lt)
        }
        if (!worseThanLast) {
          var lo = 0; var hi = buf.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            val (mns, ms, mt, _) = buf(mid)
            if (better(mns, ms, mt, ns, sv, tv)) lo = mid + 1 else hi = mid
          }
          buf.insert(lo, (ns, sv, tv, if (copyRow) rowIn.copy() else rowIn))
          retained += 1
          if (buf.length > kLocal) { buf.remove(buf.length - 1); retained -= 1 }
          if (allowSpill && retained > budget) writeRun()
        }
      }

      iter.foreach(insert(_, copyRow = true, allowSpill = true))

      if (spillFiles.isEmpty) buffers.valuesIterator.flatMap(_.iterator.map(_._4))
      else {
        // everything into key-sorted runs, then k-way merge by group key;
        // memory from here on is O(runs + k), not O(groups·k)
        if (retained > 0) writeRun()

        final class Run(f: File) {
          private val in = new DataInputStream(
            new BufferedInputStream(new FileInputStream(f)))
          var row: UnsafeRow = _
          var key: Any = _
          var done = false
          advance()
          def advance(): Unit = {
            val len = try in.readInt() catch { case _: java.io.EOFException => -1 }
            if (len < 0) { done = true; in.close(); f.delete() }
            else {
              val bytes = new Array[Byte](len)
              in.readFully(bytes)
              val r = new UnsafeRow(nFields)
              r.pointTo(bytes, len)
              row = r
              key = gBound.eval(r) // bytes are private to this record — no copy needed
            }
          }
        }

        val runs = spillFiles.map(new Run(_)).filterNot(_.done)
        new Iterator[InternalRow] {
          private var pending: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = pending.hasNext || runs.exists(!_.done)
          override def next(): InternalRow = {
            if (!pending.hasNext) {
              val minKey = runs.iterator.filterNot(_.done).map(_.key).min(keyOrd)
              buffers.clear()
              runs.foreach { r =>
                while (!r.done && keyOrd.compare(r.key, minKey) == 0) {
                  insert(r.row, copyRow = false, allowSpill = false) // run rows own their bytes
                  r.advance()
                }
              }
              pending = buffers.valuesIterator.flatMap(_.iterator.map(_._4))
                .toArray.iterator
              buffers.clear()
              retained = 0
            }
            pending.next()
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Task-side helpers — object members so executor closures don't capture
  * the plan node itself. */
object TopKPerGroupExec {

  /** (nullScore, score, tie, row); ordering = non-null first, score DESC,
    * tie ASC — `better(a, b)` ⇔ a ranks strictly before b. */
  type Entry = (Boolean, Double, Long, InternalRow)

  @inline def better(ans: Boolean, as: Double, at: Long,
      bns: Boolean, bs: Double, bt: Long): Boolean =
    if (ans != bns) bns
    else as > bs || (as == bs && at < bt)

  /** Total order on group keys for spill runs (Long/Integer/Double/Boolean/
    * UTF8String/… are all Comparable; nulls first). Only run-internal
    * consistency matters — every spill sorts with the same ordering. */
  val keyOrd: Ordering[Any] = new Ordering[Any] {
    override def compare(a: Any, b: Any): Int = (a, b) match {
      case (null, null) => 0
      case (null, _) => -1
      case (_, null) => 1
      case (x: Comparable[_], y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
      case _ => throw new IllegalStateException(s"non-comparable group key: $a")
    }
  }
}
