package graft

import graft.operators.Parity

class ParitySpec extends SparkFunSuite {

  test("fan-out invariant: one result row per input document (incl. errors)") {
    assert(Parity.parityPipeline(spark, sf).count() ===
      Tables.documents(spark, sf).count())
  }

  test("error taxonomy: encrypted and unsupported-op become error rows, not lost rows") {
    val rows = Parity.parityPipeline(spark, sf).collect()
    val errors = rows.filter(_.getAs[Boolean]("is_error"))
    assert(errors.nonEmpty)
    val outputs = errors.map(_.getAs[String]("output"))
    assert(outputs.exists(_ == "Error: File is Encrypted"))
    assert(outputs.exists(_.startsWith("Error: Unsupported operation: ")))
    // reference result-row layout: "op:" TAB input TAB output (Workers.java:124)
    assert(rows.forall(_.getAs[String]("result_row").split("\t").length === 3))
  }

  test("correlation filter selects exactly one client's rows") {
    val n = Parity.parityCorrelation(spark, sf).count()
    val total = Parity.parityPipeline(spark, sf)
      .filter("app_id = 'app3'").count()
    assert(n === total && n > 0)
  }

  test("gather accounting: per-client counts sum to the fan-out") {
    val rows = Parity.parityGather(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_results")).sum ===
      Tables.documents(spark, sf).count())
    assert(rows.forall(r =>
      r.getAs[Long]("n_errors") + r.getAs[Long]("n_ok") === r.getAs[Long]("n_results")))
  }

  test("jobspec 6-token wire format round-trips with typed fields") {
    val rows = Parity.parityJobspec(spark, sf).collect()
    assert(rows.length === 7) // app0..app6
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("terminate"))
      assert(r.getAs[Long]("n_tasks") > 0)
      assert(r.getAs[String]("file_url").startsWith("s3://graft-jobs/"))
      assert(r.getAs[String]("bucket") === "graft-bucket")
    }
  }
}
