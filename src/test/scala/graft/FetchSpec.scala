package graft

import java.util.concurrent.ConcurrentHashMap

import graft.operators.Fetch
import org.apache.spark.sql.functions._

/** Fails the first `failures` attempts per ref with a transient error,
  * then serves; counts every attempt. Top-level: the UDF closure captures
  * the transport, so it must serialize without dragging a suite along. */
class FlakyTransport(failures: Int) extends Fetch.Transport {
  val attempts = new ConcurrentHashMap[String, Integer]()
  override def fetch(ref: String): Array[Byte] = {
    val n = attempts.merge(ref, 1, (a: Integer, b: Integer) => a + b)
    if (n <= failures) throw new Fetch.TransientError(s"$ref attempt $n")
    Fetch.SyntheticStore.fetch(ref)
  }
}

/** O4 fetch semantics: error taxonomy, bounded infra-retry, idempotence
  * under redelivery (Workers.java:127-129,194-211 parity). */
class FetchSpec extends SparkFunSuite {
  private def Flaky(failures: Int) = new FlakyTransport(failures)

  test("record-level miss becomes an in-band error row, never a throw") {
    val (payload, err) = Fetch.fetchWithRetry(Fetch.SyntheticStore, "doc://src19/7")
    assert(payload === null)
    assert(err === "Error: PDF file not found - graft.operators.Fetch$NotFound")
  }

  test("transient failures are retried inside the operator (infra-retry)") {
    val flaky = Flaky(failures = 2)
    val (payload, err) = Fetch.fetchWithRetry(flaky, "doc://src1/1")
    assert(err === null)
    assert(new String(payload, "UTF-8") === "blob:doc://src1/1")
    assert(flaky.attempts.get("doc://src1/1") === 3)
  }

  test("retries exhausted -> throw (the task-reschedule path), not a wrong row") {
    val flaky = Flaky(failures = 99)
    intercept[Fetch.TransientError] {
      Fetch.fetchWithRetry(flaky, "doc://src1/2")
    }
  }

  test("retry is idempotent: flaky transport yields the same catalog result") {
    val clean = Fetch.fetchBlobs(spark, sf).collect()
    Fetch.use(Flaky(failures = 1))
    try {
      val flaky = Fetch.fetchBlobs(spark, sf).collect()
      assert(flaky.map(_.toSeq) === clean.map(_.toSeq))
    } finally Fetch.use(Fetch.SyntheticStore)
  }

  test("catalog query error taxonomy: src19 rows error, others carry content hash") {
    val rows = Fetch.fetchBlobs(spark, sf).collect()
    assert(rows.nonEmpty)
    val (errs, oks) = rows.partition(_.getAs[Boolean]("is_error"))
    assert(errs.nonEmpty && oks.nonEmpty)
    assert(errs.forall(_.getAs[String]("input_ref").startsWith("doc://src19/")))
    assert(oks.forall(_.getAs[String]("output").startsWith("fetched:")))
  }
}
