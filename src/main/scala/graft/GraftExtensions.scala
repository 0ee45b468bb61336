package graft

import graft.functions.{FloatVecDot, GramCountExplode, PostingExplode, ShingleExplode, SortedLongIntersect}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to ANY session (including pure-SQL users) via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Programmatic users can instead call
  * [[graft.functions.VectorFunctions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      exprs => FloatVecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[SortedLongIntersect].getName, "sorted_intersect"),
      exprs => SortedLongIntersect(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("shingle_explode"),
      new ExpressionInfo(classOf[ShingleExplode].getName, "shingle_explode"),
      exprs => ShingleExplode(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("posting_explode"),
      new ExpressionInfo(classOf[PostingExplode].getName, "posting_explode"),
      exprs => PostingExplode(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("gram_count_explode"),
      new ExpressionInfo(classOf[GramCountExplode].getName, "gram_count_explode"),
      exprs => GramCountExplode(exprs(0), exprs(1))))
    // the custom physical operator's planner strategy, so extension-
    // configured sessions plan TopKPerGroup without touching
    // spark.experimental (TopKPerGroupOp.topK still registers it
    // idempotently for plain sessions)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // rewrite the filter-over-row_number idiom into the bounded-memory
    // operator wherever it is provably equivalent (see TopKRewriteRule)
    e.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
  }
}
