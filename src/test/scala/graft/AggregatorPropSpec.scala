package graft

import graft.functions.{MinHashAggregator, TopKAggregator}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the typed Aggregators. Spark is free to split input
  * across arbitrary partial buffers and merge in any order — these
  * properties are exactly what that freedom requires: the result must be
  * invariant under every split/merge shape, and equal to the trivial
  * specification. Raw scalacheck generators with fixed seeds (no
  * scalatestplus bridge on this classpath). */
class AggregatorPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(7L + i)))

  // ------------------------------------------------------------- top-k

  private val k = 4
  private val rowGen: Gen[(Double, Long)] =
    Gen.zip(Gen.chooseNum(-50, 50).map(_ / 7.0), Gen.chooseNum(0L, 30L))

  private def spec(rows: Seq[(Double, Long)]): Seq[(Double, Long)] =
    rows.distinct.sortBy { case (s, t) => (-s, t) }.take(k)

  private def runSplit(rows: Seq[(Double, Long)], splitAt: Int): Seq[(Double, Long)] = {
    val agg = new TopKAggregator(k)
    val (l, r) = rows.splitAt(splitAt)
    def fold(part: Seq[(Double, Long)]) = part.foldLeft(agg.zero)(agg.reduce)
    agg.finish(agg.merge(fold(l), fold(r)))
  }

  test("top-k: any partition split + merge equals sort-take of the whole input") {
    val cases = samples(Gen.listOfN(25, rowGen), 60)
    cases.foreach { rows =>
      // ids unique per (score, tie) pair for a deterministic spec
      val distinctRows = rows.distinct
      val expected = spec(distinctRows)
      for (cut <- 0 to distinctRows.length by 5) {
        assert(runSplit(distinctRows, cut) === expected,
          s"split at $cut diverged for $distinctRows")
      }
    }
  }

  test("top-k: merge is commutative") {
    val agg = new TopKAggregator(k)
    val cases = samples(Gen.zip(Gen.listOfN(9, rowGen), Gen.listOfN(9, rowGen)), 60)
    cases.foreach { case (aRows, bRows) =>
      val a = aRows.distinct.foldLeft(agg.zero)(agg.reduce)
      val b = bRows.distinct.filterNot(aRows.contains).foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(a.clone(), b.clone()).toSeq === agg.merge(b.clone(), a.clone()).toSeq)
    }
  }

  // ----------------------------------------------------------- minhash

  private val tokenGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private def sig(tokens: Seq[String]): String =
    MinHashAggregator.finish(
      tokens.foldLeft(MinHashAggregator.zero)((b, t) => MinHashAggregator.reduce(b, (0L, t))))

  test("minhash: signature is order- and split-invariant (partial-agg safe)") {
    val cases = samples(Gen.listOfN(20, tokenGen), 40)
    cases.foreach { tokens =>
      val expected = sig(tokens)
      assert(sig(scala.util.Random.javaRandomToRandom(
        new java.util.Random(1)).shuffle(tokens)) === expected)
      for (cut <- Seq(0, 3, 10, tokens.length)) {
        val (l, r) = tokens.splitAt(cut)
        val merged = MinHashAggregator.merge(
          l.foldLeft(MinHashAggregator.zero)((b, t) => MinHashAggregator.reduce(b, (0L, t))),
          r.foldLeft(MinHashAggregator.zero)((b, t) => MinHashAggregator.reduce(b, (0L, t))))
        assert(MinHashAggregator.finish(merged) === expected)
      }
    }
  }

  test("minhash: signature slots only ever decrease as tokens fold in") {
    val cases = samples(Gen.listOfN(12, tokenGen), 20)
    cases.foreach { tokens =>
      var buf = MinHashAggregator.zero
      var prev = buf.clone()
      tokens.foreach { t =>
        buf = MinHashAggregator.reduce(buf, (0L, t))
        assert(buf.zip(prev).forall { case (now, before) => now <= before })
        prev = buf.clone()
      }
    }
  }
}
