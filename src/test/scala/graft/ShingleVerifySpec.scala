package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 guards for the shingle-family verify-join rework:
  *
  *  1. EXACTNESS of the PPJoin positional filter: the candidate join now
  *     drops co-occurrence rows whose rank-derived intersection UPPER
  *     BOUND cannot reach the jaccard threshold. The bound argument
  *     (Xiao et al., WWW'08; Dedup.ngramCandidates scaladoc) says a true
  *     pair always keeps its first shared prefix occurrence — this suite
  *     pins it against a brute-force all-pairs jaccard over the same
  *     shingle sets at sf0.001 (50 docs, 1225 pairs — exhaustive).
  *
  *  2. The SIZE-GATED BROADCAST of the verify sides
  *     (`spark.graft.shingle.verifyBroadcastBytes`): measured at sf0.1
  *     ×10 the per-pair array fan-out was the dominant shuffle bill of
  *     both families (NOTES r19); under the ceiling both verify joins
  *     must plan broadcast even when the session's auto-broadcast is
  *     off, and `0` must disable the hint (the TB-scale fallback).
  */
class ShingleVerifySpec extends AnyFunSuite {
  lazy val spark = SparkSpecBase.session
  val sf: String = SparkSpecBase.sf

  /** Brute-force reference: all same-source pairs' exact 3-gram-hash
    * jaccard/containment from the raw documents — no prefix filter, no
    * positional filter, no broadcast machinery. */
  private def bruteSets() = {
    val docs = Tables.documents(spark, sf)
    docs.select(col("doc_id"), col("source"),
      expr("""CASE WHEN length(text) >= 3
             |  THEN array_sort(array_distinct(transform(
             |    sequence(1, length(text) - 2), i -> xxhash64(substring(text, i, 3)))))
             |  ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin).as("sh"))
  }

  test("ngram pairs equal brute-force all-pairs jaccard at sf0.001") {
    graft.functions.VectorFunctions.register(spark)
    val sets = bruteSets()
    val brute = sets.as("x").join(sets.as("y"),
        col("x.source") === col("y.source") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        expr("sorted_intersect(x.sh, y.sh)").as("inter"),
        size(col("x.sh")).as("n1"), size(col("y.sh")).as("n2"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= 0.6)
      .select(col("d1"), col("d2"), col("inter"), col("jaccard"))
    val engine = operators.Dedup.queries("q_dedup_ngram")(spark, sf)
    try {
      val b = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val e = engine.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b.nonEmpty, "fixture produced no brute pairs — test is vacuous")
      assert(e === b,
        s"engine pair set diverged from brute force: missing=${(b -- e).take(5)} " +
          s"extra=${(e -- b).take(5)}")
    } finally CacheScope.releaseAll()
  }

  test("containment pairs equal brute-force all-pairs containment at sf0.001") {
    graft.functions.VectorFunctions.register(spark)
    val sets = bruteSets()
    val brute = sets.as("x").join(sets.as("y"),
        col("x.source") === col("y.source") && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("contained_id"), col("y.doc_id").as("container_id"),
        expr("sorted_intersect(x.sh, y.sh)").as("inter"), size(col("x.sh")).as("n1"))
      .filter(lit(5) * col("inter") >= lit(4) * col("n1") && col("n1") > 0)
      .select(col("contained_id"), col("container_id"))
    val engine = operators.Dedup.queries("q_dedup_containment")(spark, sf)
    try {
      val b = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val e = engine.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b.nonEmpty, "fixture produced no brute pairs — test is vacuous")
      assert(e === b,
        s"engine pair set diverged from brute force: missing=${(b -- e).take(5)} " +
          s"extra=${(e -- b).take(5)}")
    } finally CacheScope.releaseAll()
  }

  private def broadcastJoins(p: SparkPlan): Int = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    (if (p.isInstanceOf[BroadcastHashJoinExec]) 1 else 0) + kids.map(broadcastJoins).sum
  }

  test("verify joins broadcast under the size ceiling and revert at 0") {
    val s = spark
    val prevAuto = s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable the planner's own broadcast so the count isolates the
      // engine's size-gated hint (at fixture scale AQE would broadcast
      // everything anyway and mask a lost hint)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hinted = broadcastJoins(operators.Dedup.queries("q_dedup_ngram")(spark, sf)
        .queryExecution.executedPlan)
      CacheScope.releaseAll(); s.catalog.clearCache()
      s.conf.set("spark.graft.shingle.verifyBroadcastBytes", "0")
      val unhinted = broadcastJoins(operators.Dedup.queries("q_dedup_ngram")(spark, sf)
        .queryExecution.executedPlan)
      assert(hinted >= 2,
        s"expected both verify sides broadcast under the ceiling, got $hinted")
      assert(unhinted < hinted,
        s"verifyBroadcastBytes=0 should drop the broadcast hint " +
          s"(hinted=$hinted, unhinted=$unhinted)")
    } finally {
      s.conf.unset("spark.graft.shingle.verifyBroadcastBytes")
      prevAuto match {
        case Some(v) => s.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      CacheScope.releaseAll(); s.catalog.clearCache()
    }
  }
}
