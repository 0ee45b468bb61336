package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bench's measurement contract: a failing query is reported as missing
  * (failures list), never as the wall time of its exception. */
class BenchSpec extends SparkFunSuite {

  test("broken query lands in failures, not in the timing map") {
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(10).toDF("id")
    val broken: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("deliberately broken")
    val (timed, failed) = Bench.measure(spark, sf, reps = 1,
      Seq("q_ok" -> good, "q_broken" -> broken))
    assert(timed.map(_._1) === Seq("q_ok"))
    assert(timed.head._2 >= 0.0)
    assert(failed === Seq("q_broken"))
  }
}
