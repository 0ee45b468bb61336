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

  test("HttpTransport against an in-process server: payload, 404, retry-then-ok, 5xx exhaustion") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val flakyHits = new java.util.concurrent.atomic.AtomicInteger(0)
    def handle(path: String)(f: HttpExchange => Unit): Unit =
      server.createContext(path, (x: HttpExchange) => try f(x) finally x.close())
    def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) x.getResponseBody.write(body)
    }
    handle("/ok") { x => respond(x, 200, "payload-bytes".getBytes("UTF-8")) }
    handle("/missing") { x => respond(x, 404, Array.emptyByteArray) }
    handle("/flaky") { x => // 503 twice, then serve — inside the retry budget
      if (flakyHits.incrementAndGet() <= 2) respond(x, 503, Array.emptyByteArray)
      else respond(x, 200, "eventually".getBytes("UTF-8"))
    }
    handle("/down") { x => respond(x, 500, Array.emptyByteArray) }
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    val http = new Fetch.HttpTransport()
    try {
      assert(new String(http.fetch(s"$base/ok"), "UTF-8") === "payload-bytes")

      val (p404, err) = Fetch.fetchWithRetry(http, s"$base/missing")
      assert(p404 === null)
      assert(err === "Error: PDF file not found - graft.operators.Fetch$NotFound")

      val (pFlaky, errFlaky) = Fetch.fetchWithRetry(http, s"$base/flaky")
      assert(errFlaky === null)
      assert(new String(pFlaky, "UTF-8") === "eventually")
      assert(flakyHits.get() === 3, "expected 2 transient failures then success")

      intercept[Fetch.TransientError] { Fetch.fetchWithRetry(http, s"$base/down") }

      // connection-refused (nothing listens on the ephemeral port after
      // shutdown of a throwaway socket) is infra, not a record error
      val free = { val ss = new java.net.ServerSocket(0)
        try ss.getLocalPort finally ss.close() }
      intercept[Fetch.TransientError] { http.fetch(s"http://127.0.0.1:$free/x") }

      // an unparseable ref is a bad RECORD -> in-band error, no retry storm
      val (pBad, errBad) = Fetch.fetchWithRetry(http, "http://[not a uri")
      assert(pBad === null && errBad != null)
    } finally server.stop(0)
  }
}
