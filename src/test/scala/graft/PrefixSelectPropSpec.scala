package graft

import graft.operators.Curation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property suite for the two-phase distributed prefix-sum selection
  * cores (tokenBudgetFrom / domainCapFrom). The fixture specs prove
  * bit-equality on the real corpus; these drive the cores with
  * ADVERSARIAL frames — qualities sitting exactly on 1/256 bucket
  * edges, mass ties (every tie resolves by doc_id), and budgets chosen
  * to land exactly ON an achievable prefix boundary (`before == budget`
  * must DROP: the rule is strictly `before < budget`) — against the
  * naive global-window reference. Raw scalacheck generators with fixed
  * seeds, same pattern as AggregatorPropSpec. */
class PrefixSelectPropSpec extends SparkFunSuite {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // bucket-edge multiples of 1/256, a heavy tie value, and arbitrary
  // 6-dp qualities (what withQuality emits) — including 0.0 and 1.0
  private val qualityGen: Gen[Double] = Gen.frequency(
    3 -> Gen.chooseNum(0, 256).map(_ / 256.0),
    2 -> Gen.const(0.5),
    5 -> Gen.chooseNum(0, 1000000).map(_ / 1e6))

  test("token budget core equals the global-window greedy rule on adversarial frames") {
    val rowGen = Gen.zip(qualityGen, Gen.chooseNum(1L, 40L))
    val frames = samples(Gen.listOfN(120, rowGen), 4, 11L) :+
      samples(rowGen, 1, 99L) // single-row frame
    frames.zipWithIndex.foreach { case (rows, fi) =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((q, t), i) => (i.toLong, q, t) }
        .toDF("doc_id", "quality", "n_tokens")
      val ref = df.withColumn("before", coalesce(
        sum(col("n_tokens")).over(
          Window.orderBy(col("quality").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val prefixes = ref.orderBy(col("quality").desc, col("doc_id"))
        .select(col("before")).collect().map(_.getLong(0))
      val total = rows.map(_._2).sum
      // budgets: trivial, exact achievable boundaries, interior, past-end
      val budgets = Seq(1L, total / 3 max 1L, total, total + 7L) ++
        Seq(prefixes(prefixes.length / 2), prefixes.last).filter(_ > 0)
      for (b <- budgets.distinct) {
        val expected = ref.filter(col("before") < b)
          .select(col("doc_id"), col("quality"), col("n_tokens"))
          .orderBy(col("doc_id")).collect().map(_.toString).toSeq
        val got = Curation.tokenBudgetFrom(df, b).collect().map(_.toString).toSeq
        CacheScope.releaseAll()
        assert(got === expected, s"frame $fi budget $b diverged")
      }
    }
  }

  test("domain cap core equals the per-source window rule on adversarial frames") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(1L, 40L))
    val frames = samples(Gen.listOfN(150, rowGen), 4, 23L)
    frames.zipWithIndex.foreach { case (rows, fi) =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((src, t), i) => (src, i.toLong, t) }
        .toDF("source", "doc_id", "n_tokens")
      val ref = df
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("before", coalesce(
          sum(col("n_tokens")).over(
            Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // an exact achievable per-source boundary for source "a"
      val aBoundary = ref.filter(col("source") === "a")
        .orderBy(col("h"), col("doc_id"))
        .select(col("before")).collect().map(_.getLong(0))
      val caps = (Seq(1L, 40L, 400L, 100000L) ++
        Seq(aBoundary(aBoundary.length / 2)).filter(_ > 0)).distinct
      for (c <- caps) {
        val expected = ref.filter(col("before") < c)
          .select(col("source"), col("doc_id"), col("n_tokens"))
          .orderBy(col("source"), col("doc_id")).collect().map(_.toString).toSeq
        val got = Curation.domainCapFrom(
          df.select(col("source"), col("doc_id"), col("n_tokens")), c)
          .collect().map(_.toString).toSeq
        CacheScope.releaseAll()
        assert(got === expected, s"frame $fi cap $c diverged")
      }
    }
  }

  // weights on exact 1024-bucket edges, one heavy tie value (all-tied
  // mass collapses into a single straddle bucket), negatives (DIV
  // truncates toward zero — monotonicity must survive the sign change),
  // and arbitrary values; frame sizes down to 1 for ceil(n/4) edges
  private val weightGen: Gen[Long] = Gen.frequency(
    3 -> Gen.chooseNum(-8, 8).map(_ * 1024L),
    2 -> Gen.const(160000L),
    2 -> Gen.chooseNum(-2048L, 2048L),
    5 -> Gen.chooseNum(0L, 300000L))

  test("dsir selection core equals the global sort-take rule on adversarial frames") {
    val rowGen = Gen.zip(weightGen, Gen.chooseNum(0, 4))
    val frames =
      (1 to 5).map(n => samples(rowGen, n, 300L + n)) ++
        samples(Gen.listOfN(120, rowGen), 4, 17L)
    frames.zipWithIndex.foreach { case (rows, fi) =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((w, srcI), i) => (i.toLong, s"s$srcI", w) }
        .toDF("doc_id", "source", "avg_weight_q6")
      val quota = (rows.size + 3) / 4
      val keptIds = rows.zipWithIndex
        .map { case ((w, _), i) => (i.toLong, w) }
        .sortBy { case (id, w) => (-w, id) }
        .take(quota).map(_._1).toSet
      val expected = rows.zipWithIndex
        .groupBy { case ((_, srcI), _) => s"s$srcI" }
        .map { case (src, rs) =>
          (src, rs.size.toLong, rs.count { case (_, i) => keptIds(i.toLong) }.toLong)
        }.toSeq.sortBy(_._1)
      val got = Curation.dsirSelectFrom(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      CacheScope.releaseAll()
      assert(got === expected, s"frame $fi diverged")
    }
  }
}
