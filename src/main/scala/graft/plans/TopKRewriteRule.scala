package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule (`Rule[LogicalPlan]`): rewrite the standard top-k-per-
  * group idiom
  *
  *   df.withColumn("rn", row_number.over(partitionBy(g).orderBy(s.desc, t)))
  *     .filter($"rn" <= k).drop("rn")
  *
  * into the bounded-memory [[TopKPerGroup]] operator — users keep writing
  * the declarative window form; the engine plans the O(k)-heap physical
  * operator with NO sort and NO rank recomputation. This goes one step
  * beyond Spark's own `InferWindowGroupLimit` (which bounds each group to
  * k rows but still sorts and runs the Window to materialize the rank):
  * when the rank column is immediately projected away, the Window is pure
  * overhead and the whole subtree collapses to one exchange + heap scan.
  *
  * Fires ONLY on the exact shape the operator is equivalent to:
  *  - a single `row_number()` window expression (rank()/dense_rank() admit
  *    ties past k — not this operator's semantics);
  *  - partition key: one Attribute of an atomic comparable type (the
  *    operator's spill contract);
  *  - order: (DOUBLE attribute DESC NULLS LAST, BIGINT/INT attribute ASC)
  *    — exactly the exec's comparator;
  *  - filter: `rn <= lit` / `rn < lit` with a positive integral literal;
  *  - the enclosing Project references child columns only (the rank attr
  *    dies at the Filter).
  * A `WindowGroupLimit` Spark inferred below the Window is absorbed (the
  * heap subsumes it). Null tie values follow the operator's existing
  * contract (primitive unboxing), identical to calling
  * [[TopKPerGroupOp.topK]] by hand.
  *
  * Register per-session via `spark.experimental.extraOptimizations` (the
  * catalog query does this idempotently) or for every session through
  * [[graft.GraftExtensions]].
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def atomic(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType | BooleanType | DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = {
    def intVal(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.longValue)
      case l2: java.lang.Long => Some(l2.longValue)
      case s: java.lang.Short => Some(s.longValue)
      case _ => None
    }
    val k = cond match {
      case LessThanOrEqual(a: Attribute, l: Literal) if a.exprId == rn.exprId =>
        intVal(l)
      case LessThan(a: Attribute, l: Literal) if a.exprId == rn.exprId =>
        intVal(l).map(_ - 1)
      case GreaterThanOrEqual(l: Literal, a: Attribute) if a.exprId == rn.exprId =>
        intVal(l)
      case GreaterThan(l: Literal, a: Attribute) if a.exprId == rn.exprId =>
        intVal(l).map(_ - 1)
      case _ => None
    }
    k.filter(v => v >= 1 && v <= Int.MaxValue).map(_.toInt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window)) =>
      val rewritten = for {
        // exactly one window expression, and it is row_number()
        (rankAttr, spec) <- w.windowExpressions match {
          case Seq(a @ Alias(WindowExpression(_: RowNumber, s: WindowSpecDefinition), _)) =>
            Some((a.toAttribute, s))
          case _ => None
        }
        g <- spec.partitionSpec match {
          case Seq(attr: Attribute) if atomic(attr.dataType) => Some(attr)
          case _ => None
        }
        (score, tie) <- spec.orderSpec match {
          case Seq(SortOrder(sc: Attribute, Descending, NullsLast, _),
                   SortOrder(t: Attribute, Ascending, _, _))
              if sc.dataType == DoubleType &&
                (t.dataType == LongType || t.dataType == IntegerType) =>
            Some((sc, t))
          case _ => None
        }
        k <- limitOf(cond, rankAttr)
        // an InferWindowGroupLimit below the Window is subsumed by the heap
        child = w.child match {
          case wgl: WindowGroupLimit => wgl.child
          case c => c
        }
        // the projection must not need the rank (or anything else the
        // Window alone could provide)
        if AttributeSet(projList.flatMap(_.references)).subsetOf(child.outputSet)
        if Seq(g, score, tie).forall(child.outputSet.contains)
      } yield Project(projList, TopKPerGroup(g, score, tie, k, child))
      rewritten.getOrElse(p)
  }
}
