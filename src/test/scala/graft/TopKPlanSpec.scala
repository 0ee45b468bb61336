package graft

import graft.plans.{TopKPerGroupExec, TopKPerGroupOp}
import org.apache.spark.sql.functions._

/** Custom physical operator hardening: spill path, type validation, null
  * ordering parity with the window form. */
class TopKPlanSpec extends SparkFunSuite {

  /** AQE wraps stages in AdaptiveSparkPlanExec/QueryStageExec, which hide
    * their plans from `collect` — recurse through them explicitly. */
  private def findExecs(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[TopKPerGroupExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val self = p match {
      case e: TopKPerGroupExec => Seq(e)
      case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self ++ kids.flatMap(findExecs)
  }

  test("spill path: 1M distinct groups under a tiny buffer budget, exact result") {
    val s = spark
    import s.implicits._
    val n = 1000000L
    // 1M groups x 3 rows; per-group scores/ties derived from the id
    val df = s.range(3 * n)
      .select((col("id") % n).as("g"),
        (col("id") % 7).cast("double").as("score"),
        col("id").as("tie"))
    s.conf.set("spark.graft.topkPerGroup.maxBufferedRows", "100000")
    try {
      val out = TopKPerGroupOp.topK(df, "g", "score", "tie", 2)
      // execute THIS plan instance (derived DataFrames re-plan and would
      // leave these metrics untouched)
      assert(out.queryExecution.toRdd.count() === 2 * n)
      val spills = findExecs(out.queryExecution.executedPlan)
        .map(_.metrics("numSpills").value).sum
      assert(spills > 0, "budget 100k with 2M retained rows must spill")
      // every group contributes exactly k=2 rows (3 inputs each)
      val got = out.groupBy(col("g")).agg(count(lit(1)).as("c"))
      assert(got.filter(col("c") =!= 2).count() === 0)
      // spot-check exactness against the window form on a slice
      val slice = df.filter(col("g") < 100)
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("score").desc, col("tie"))
      val expected = slice.withColumn("rn", row_number().over(win))
        .filter(col("rn") <= 2).drop("rn")
        .orderBy(col("g"), col("score").desc, col("tie"))
        .collect().map(_.toSeq)
      val actual = TopKPerGroupOp.topK(slice, "g", "score", "tie", 2)
        .orderBy(col("g"), col("score").desc, col("tie"))
        .collect().map(_.toSeq)
      assert(actual === expected)
    } finally s.conf.unset("spark.graft.topkPerGroup.maxBufferedRows")
  }

  test("type validation fails at build time, not as a task MatchError") {
    val s = spark
    val df = s.range(10).select(col("id").as("g"),
      col("id").cast("string").as("score"), col("id").as("tie"))
    val e = intercept[IllegalArgumentException] {
      TopKPerGroupOp.topK(df, "g", "score", "tie", 3)
    }
    assert(e.getMessage.contains("must be DOUBLE"))
    val df2 = s.range(10).select(col("id").as("g"),
      col("id").cast("double").as("score"), col("id").cast("string").as("tie"))
    val e2 = intercept[IllegalArgumentException] {
      TopKPerGroupOp.topK(df2, "g", "score", "tie", 3)
    }
    assert(e2.getMessage.contains("must be BIGINT or INT"))
    // non-comparable group key (array) rejected at analysis time too —
    // previously this only failed at task time, and only when a spill hit
    val df3 = s.range(10).select(array(col("id")).as("g"),
      col("id").cast("double").as("score"), col("id").as("tie"))
    val e3 = intercept[IllegalArgumentException] {
      TopKPerGroupOp.topK(df3, "g", "score", "tie", 3)
    }
    assert(e3.getMessage.contains("atomic comparable"))
  }

  test("a buffer budget below k fails loudly instead of losing merge rows") {
    val s = spark
    s.conf.set("spark.graft.topkPerGroup.maxBufferedRows", "2")
    try {
      val df = s.range(100).select((col("id") % 5).as("g"),
        col("id").cast("double").as("score"), col("id").as("tie"))
      val e = intercept[Exception] {
        TopKPerGroupOp.topK(df, "g", "score", "tie", 3).collect()
      }
      assert(e.getMessage.contains("must be >= k") ||
        Option(e.getCause).exists(_.getMessage.contains("must be >= k")))
    } finally s.conf.unset("spark.graft.topkPerGroup.maxBufferedRows")
  }

  test("null scores order last, matching row_number over desc_nulls_last") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[Double], Long)](
      (1L, Some(5.0), 1L), (1L, None, 2L), (1L, Some(7.0), 3L), (1L, None, 4L),
      (2L, None, 5L), (2L, None, 6L),
      (3L, Some(1.0), 7L))
      .toDF("g", "score", "tie")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc_nulls_last, col("tie"))
    val expected = df.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 2).drop("rn")
      .orderBy(col("g"), col("tie")).collect().map(_.toSeq)
    val actual = TopKPerGroupOp.topK(df, "g", "score", "tie", 2)
      .orderBy(col("g"), col("tie")).collect().map(_.toSeq)
    assert(actual === expected)
  }

  test("helper ordering: non-null beats null, score desc, tie asc") {
    import TopKPerGroupExec.better
    assert(better(false, 1.0, 9, true, 0.0, 0))   // non-null beats null
    assert(!better(true, 99.0, 0, false, -1.0, 9))
    assert(better(false, 2.0, 5, false, 1.0, 1))  // score desc
    assert(better(false, 2.0, 1, false, 2.0, 5))  // tie asc
  }

  test("optimizer rule rewrites the row_number idiom into TopKPerGroupExec") {
    val df = operators.Relational3.topkRewrite(spark, sf)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan
    assert(findExecs(plan).nonEmpty,
      s"rewrite did not fire — plan:\n${plan.treeString.take(2000)}")
    val planStr = plan.treeString
    assert(!planStr.contains("WindowExec") && !planStr.contains("WindowGroupLimit"),
      "Window survived the rewrite")
    // ground truth: the same idiom with the rule NOT registered (fresh
    // column lineage, no experimental mutation) — results must be equal
    import org.apache.spark.sql.expressions.Window
    val expected = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rk") <= 3).drop("rk")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(_.toSeq)
    assert(df.collect().map(_.toSeq).toSeq === expected.toSeq)
  }

  test("the rewrite leaves ineligible shapes alone (rank kept, wrong order type)") {
    graft.plans.TopKPerGroupOp.ensureRegistered(spark)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // rn survives into the output -> TopKPerGroup cannot produce it
    val keepsRank = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"))
    assert(findExecs(keepsRank.queryExecution.executedPlan).isEmpty,
      "rule fired although the rank column is still referenced")
    // rank() admits ties past k -> not this operator's semantics
    val rankFn = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))
    assert(findExecs(rankFn.queryExecution.executedPlan).isEmpty,
      "rule fired on rank(), which admits ties")
  }

  test("stratified sample selects via the custom op with no sort below it") {
    val df = operators.Sampling.sampleStratified(spark, sf)
    df.queryExecution.toRdd.count() // finalize THIS instance's AQE plan
    val plan = df.queryExecution.executedPlan
    val execs = findExecs(plan)
    assert(execs.nonEmpty, "stratified sampling no longer uses TopKPerGroupExec")
    // the input side must reach the op heap-selected, never sorted — the
    // only Sorts allowed are ABOVE the op (ranking the <=100 survivors)
    def sortsBelow(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val self = p match {
        case _: org.apache.spark.sql.execution.SortExec => Seq(p.nodeName)
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(sortsBelow)
    }
    val below = execs.flatMap(e => sortsBelow(e.child))
    assert(below.isEmpty, s"full input sort below the top-k op: $below")
  }
}
