package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Permanent plan-hygiene guard: a nested-loop or cartesian join appearing
  * in a catalog query that didn't deliberately choose one is exactly the
  * scale regression the 100 TB stance forbids — fail the suite, not the
  * cluster. */
class PlanHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkSpecBase.session

  /** The three queries where a nested loop IS the design:
    * - q_band_join: inequality join against a 5-row interval table;
    * - q_knn_brute: the deliberate brute-force baseline (queries broadcast);
    * - q_knn_ivf: the 16-row centroid scoring cross product (= assignment). */
  private val intendedNestedLoop = Set("q_band_join", "q_knn_brute", "q_knn_ivf")

  /** Queries whose BUILD already executes jobs (sinks write, streams run,
    * eager caches materialize) — planning them here would re-run half of
    * Verify; their plans are covered by the explicit audits in NOTES.md. */
  private def skip(name: String): Boolean =
    name.startsWith("q_stream") || name.startsWith("q_sink") ||
      Set("q_source_binary", "q_partitioned_sink", "q_dedup_minhash",
        "q_dedup_ngram", "q_knn_ivf", "q_bucketed_join").contains(name)

  private def offenders(p: SparkPlan): Seq[String] = {
    val self = p match {
      case _: BroadcastNestedLoopJoinExec => Seq("BroadcastNestedLoopJoin")
      case _: CartesianProductExec => Seq("CartesianProduct")
      case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self ++ kids.flatMap(offenders)
  }

  test("no batch catalog query plans an unintended nested-loop or cartesian join") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => skip(name) || intendedNestedLoop(name) }
      .flatMap { case (name, fn) =>
        val found = offenders(fn(spark, SparkSpecBase.sf).queryExecution.executedPlan)
        if (found.nonEmpty) Seq(s"$name: ${found.mkString(", ")}") else Nil
      }
    assert(bad.isEmpty, s"unintended join strategies:\n${bad.mkString("\n")}")
  }
}
