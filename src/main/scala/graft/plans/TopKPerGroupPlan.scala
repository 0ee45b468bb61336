package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator custom plan (SURVEY.md §7.3 tier (c)): top-k rows per
  * group, selected by (score DESC, tie ASC).
  *
  * Spark's built-in route — `row_number().over(Window...)` + filter —
  * must SORT every group's full row set inside each partition before it
  * can rank. This operator declares `ClusteredDistribution(group)` (so
  * Catalyst inserts exactly one hash exchange) and then keeps a bounded
  * k-buffer per group in a single pass: O(n·log k) work, O(groups·k)
  * memory, no sort buffer, no spill pressure. At 100 TB with millions of
  * groups the difference between "sort everything" and "keep k per
  * group" is the job.
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
    * resolved by name against the analyzed plan; the strategy is
    * registered idempotently on the session. */
  def topK(df: DataFrame, groupCol: String, scoreCol: String, tieCol: String,
      k: Int): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      cs.experimental.extraStrategies =
        TopKPerGroupStrategy +: cs.experimental.extraStrategies
    val lp = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${lp.output.map(_.name)}"))
    org.apache.spark.sql.classic.GraftBridge.ofRows(cs,
      TopKPerGroup(attr(groupCol), attr(scoreCol), attr(tieCol), k, lp))
  }
}

case class TopKPerGroupExec(group: Expression, score: Expression, tie: Expression,
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** One hash exchange on the group key; no ordering requirement — the
    * whole point is to never sort. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(group)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val gBound = BindReferences.bindReference(group, child.output)
    val sBound = BindReferences.bindReference(score, child.output)
    val tBound = BindReferences.bindReference(tie, child.output)
    val kLocal = k
    child.execute().mapPartitions { iter =>
      // group key -> bounded buffer sorted (score DESC, tie ASC)
      val buffers = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.ArrayBuffer[(Double, Long, InternalRow)]]
      iter.foreach { row =>
        val rawKey = gBound.eval(row)
        // iterator rows are reused backing buffers — copy anything retained
        val key = rawKey match {
          case u: UTF8String => u.copy()
          case x => x
        }
        val sv = sBound.eval(row).asInstanceOf[Double]
        val tv = tBound.eval(row) match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
        }
        val buf = buffers.getOrElseUpdate(key,
          new scala.collection.mutable.ArrayBuffer[(Double, Long, InternalRow)](kLocal + 1))
        val full = buf.length >= kLocal
        val worseThanLast = full && {
          val (ls, lt, _) = buf.last
          sv < ls || (sv == ls && tv > lt)
        }
        if (!worseThanLast) {
          // binary-insert position by (score DESC, tie ASC)
          var lo = 0; var hi = buf.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            val (ms, mt, _) = buf(mid)
            if (ms > sv || (ms == sv && mt < tv)) lo = mid + 1 else hi = mid
          }
          buf.insert(lo, (sv, tv, row.copy()))
          if (buf.length > kLocal) buf.remove(buf.length - 1)
        }
      }
      buffers.valuesIterator.flatMap(_.iterator.map(_._3))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
