package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Quality-gate threshold contract. Two guards:
  *
  * 1. The exact path's P25 must be a RANK-SELECTED MEMBER value (the
  *    NOTES rule: interpolated percentiles differ between engines in the
  *    last ulp, so a percentile feeding a comparison must be the k-th
  *    smallest member, k = ceil(n/4)) — checked at two scale factors so
  *    the da75d77 class of bug (interpolation silently reintroduced,
  *    caught only at a bigger SF) cannot return.
  * 2. The `spark.graft.quality.approxThreshold=true` production path may
  *    move keep decisions only within the sketch's rank tolerance.
  */
class QualityGateSpec extends SparkFunSuite {

  private val bothSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** Independent restatement of the gate's quality formula (deliberate
    * duplication — the guard must not share code with what it guards). */
  private def qualityOf(d: String) =
    graft.Tables.documents(spark, d)
      .withColumn("ttr",
        expr("size(array_distinct(split(text, ' ')))").cast("double") /
          expr("size(split(text, ' '))"))
      .select(col("source"),
        round(least(lit(1.0), length(col("text")).cast("double") / 400.0) * 0.5 +
          col("ttr") * 0.5, 6).as("quality"))

  test("exact path: p25 is the ceil(n/4)-th smallest member value, at both SFs") {
    for (d <- bothSfs) {
      val expected = qualityOf(d).collect()
        .groupBy(_.getString(0))
        .map { case (src, rows) =>
          val qs = rows.map(_.getDouble(1)).sorted
          src -> qs(math.ceil(qs.length / 4.0).toInt - 1)
        }
      val got = TextAnalysis.qualityGate(spark, d).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expected, s"at $d")
    }
  }

  test("approx path: member-valued thresholds, keep decisions within sketch tolerance") {
    val d = "/root/testdata/sf0.01"
    val exact = TextAnalysis.qualityGate(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(3))).toMap
    spark.conf.set("spark.graft.quality.approxThreshold", "true")
    val approx =
      try TextAnalysis.qualityGate(spark, d).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(3))).toMap
      finally spark.conf.unset("spark.graft.quality.approxThreshold")
    assert(approx.keySet === exact.keySet)
    val members = qualityOf(d).collect()
      .groupBy(_.getString(0)).map { case (s, r) => s -> r.map(_.getDouble(1)).toSet }
    val counts = qualityOf(d).collect().groupBy(_.getString(0)).map { case (s, r) => s -> r.length }
    for ((src, (p25, nKept)) <- approx) {
      assert(members(src).contains(p25),
        s"$src: sketch threshold $p25 is not an observed quality value")
      val n = counts(src)
      // accuracy 10000 → rank error ≤ n/1e4 (+1 for the rank convention);
      // only docs between the two thresholds can flip
      val tol = math.max(2L, math.ceil(n / 10000.0).toLong + 1)
      assert(math.abs(nKept - exact(src)._2) <= tol,
        s"$src: kept $nKept (approx) vs ${exact(src)._2} (exact), tol $tol")
    }
  }
}
