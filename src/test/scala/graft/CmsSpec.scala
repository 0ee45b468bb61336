package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Count-Min estimator contract: estimates are exact upper bounds (the
  * property the heavy-hitter pruning's no-false-negative argument rests
  * on), and the pruned query equals the plain exact computation. */
class CmsSpec extends SparkFunSuite {

  test("cms estimate >= exact count for every token") {
    graft.functions.CmsFunctions.register(spark)
    Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .createOrReplaceTempView("graft_cms_spec_tokens")
    val rows = spark.sql(
      """SELECT token, COUNT(*) AS exact,
        |  graft_cms_estimate(
        |    (SELECT count_min_sketch(token, 0.0001d, 0.99d, 42)
        |     FROM graft_cms_spec_tokens),
        |    token) AS est
        |FROM graft_cms_spec_tokens GROUP BY token""".stripMargin).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS UNDERestimated '${r.getString(0)}': ${r.getLong(2)} < ${r.getLong(1)}")
  }

  test("local-candidate path (hhLocalCandidates) produces identical output") {
    val default = TextAnalysis.heavyHittersCms(spark, sf)
      .collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.text.hhLocalCandidates", "true")
    val local =
      try TextAnalysis.heavyHittersCms(spark, sf).collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.text.hhLocalCandidates")
    assert(local === default)
    assert(local.nonEmpty)
  }

  test("pruned heavy hitters equal the exact heavy hitters") {
    val pruned = TextAnalysis.heavyHittersCms(spark, sf)
      .collect().map(_.toString).toSeq
    val tokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val total = tokens.count()
    val exact = tokens.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= total / 50)
      .orderBy(col("token"))
      .collect().map(_.toString).toSeq
    assert(pruned === exact)
    assert(pruned.nonEmpty)
  }
}
