package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.operators.{EventsOps, GraphOps, TextAnalysis}

/** Column-pruning audit: a scan that reads columns the query never uses
  * is wrong at any scale and catastrophic at 100 TB (documents.text is
  * the fat column; events.props likewise). For representative catalog
  * queries, assert the parquet scan's required schema is EXACTLY the
  * columns the query consumes — a regression that widens a scan fails
  * loudly here. */
class ScanPruningSpec extends SparkFunSuite {

  private def scanSchemas(df: DataFrame): Seq[Set[String]] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        // descend into cached relations — the parquet scan that feeds a
        // persist() lives inside the InMemoryRelation's cached plan
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          Seq(m.relation.cachedPlan)
        case other => other.children
      }
      (p match {
        case f: FileSourceScanExec => Seq(f)
        case _ => Nil
      }) ++ kids.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
      .map(_.requiredSchema.fieldNames.toSet)
  }

  test("retention cohort reads only (ts, user_id) from events") {
    val schemas = scanSchemas(EventsOps.retention(spark, sf))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(s === Set("ts", "user_id"),
      s"events scan reads $s"))
  }

  test("pagerank reads only (l_partkey, l_suppkey) from lineitem") {
    val df = GraphOps.pagerank(spark, sf)
    try {
      val schemas = scanSchemas(df)
      assert(schemas.nonEmpty)
      schemas.foreach(s => assert(s === Set("l_partkey", "l_suppkey"),
        s"lineitem scan reads $s"))
    } finally CacheScope.releaseAll()
  }

  test("gopher filter reads only (source, text) from documents") {
    val schemas = scanSchemas(TextAnalysis.gopherFilter(spark, sf))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(s === Set("source", "text"),
      s"documents scan reads $s"))
  }

  test("funnel reads only (ts, user_id, event_type) from events") {
    val schemas = scanSchemas(EventsOps.funnel(spark, sf))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(s === Set("ts", "user_id", "event_type"),
      s"events scan reads $s"))
  }
}
