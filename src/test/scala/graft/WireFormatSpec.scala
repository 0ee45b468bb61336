package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the §2.3 wire formats: building a message and
  * re-tokenizing it recovers the fields, for arbitrary well-formed inputs
  * (fields never contain the delimiter — the reference has the same
  * constraint, its fields are URLs/ids/ops). Uses raw scalacheck
  * generators with a fixed seed, evaluated in one batched plan. */
class WireFormatSpec extends AnyFunSuite {
  lazy val spark = SparkSpecBase.session

  private val fieldGen: Gen[String] =
    Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("task message TAB round trip (O8/O9)") {
    val s = spark
    import s.implicits._
    val cases = samples(Gen.zip(fieldGen, Gen.oneOf("ToText", "ToHTML", "ToImage"), fieldGen), 100)
    val rows = cases.toDF("a", "o", "r")
      .withColumn("msg", concat_ws("\t", col("a"), col("o"), col("r")))
      .select(col("a"), col("o"), col("r"),
        split(col("msg"), "\t").getItem(0).as("a2"),
        split(col("msg"), "\t").getItem(1).as("o2"),
        split(col("msg"), "\t").getItem(2).as("r2"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[String]("a2") === r.getAs[String]("a"))
      assert(r.getAs[String]("o2") === r.getAs[String]("o"))
      assert(r.getAs[String]("r2") === r.getAs[String]("r"))
    }
  }

  test("jobspec 6-token SPACE round trip with typed n and terminate") {
    val s = spark
    import s.implicits._
    val cases = samples(Gen.zip(fieldGen, Gen.oneOf(true, false), Gen.choose(1, 100000)), 100)
    val rows = cases.toDF("app", "term", "n")
      .withColumn("msg", concat_ws(" ",
        col("app"), col("term"), col("n"),
        concat(lit("s3://in/"), col("app")), lit("b"), lit("k")))
      .select(col("app"), col("term"), col("n"),
        split(col("msg"), " ").getItem(0).as("app2"),
        split(col("msg"), " ").getItem(1).cast("boolean").as("term2"),
        split(col("msg"), " ").getItem(2).cast("long").as("n2"),
        split(col("msg"), " ").getItem(4).as("bucket"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[String]("app2") === r.getAs[String]("app"))
      assert(r.getAs[Boolean]("term2") === r.getAs[Boolean]("term"))
      assert(r.getAs[Long]("n2") === r.getAs[Int]("n").toLong)
      assert(r.getAs[String]("bucket") === "b")
    }
  }
}
