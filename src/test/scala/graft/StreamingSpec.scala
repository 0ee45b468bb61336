package graft

import java.sql.Timestamp

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Top-level so the product encoder resolves cleanly. */
case class TestEv(event_id: Long, ts: Timestamp, event_type: String, value: Double)

class StreamingSpec extends SparkFunSuite {

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("MemoryStream tumbling counts match the batch aggregation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val data = Seq(
      TestEv(1, t(5), "click", 1.0), TestEv(2, t(10), "click", 2.0),
      TestEv(3, t(40), "view", 3.0), TestEv(4, t(59), "click", 4.0))
    val ms = MemoryStream[TestEv]
    ms.addData(data)
    val out = Streaming.runToMemory(s,
      Streaming.tumblingCounts(ms.toDF()), "t_mem_tumbling", "complete")
      .select(unix_millis(col("w.start")).as("ws"), col("event_type"), col("n"),
        col("total_value"))
      .collect()
    // batch twin on the same rows
    val batch = data.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("ws"), col("event_type"), col("n"))
      .collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ===
      batch.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet)
    assert(out.map(_.getAs[Double]("total_value")).sum === 10.0)
  }

  test("streaming dedup suppresses injected redelivery duplicates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[TestEv]
    // event 10 arrives 3 times (visibility-timeout redelivery analog)
    ms.addData(Seq(
      TestEv(10, t(1), "click", 1.0), TestEv(10, t(1), "click", 1.0),
      TestEv(10, t(1), "click", 1.0), TestEv(11, t(2), "view", 2.0)))
    val out = Streaming.runToMemory(s,
      ms.toDF().withWatermark("ts", "1 hour").dropDuplicates("event_id"),
      "t_mem_dedup", "append")
      .collect()
    assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq === Seq(10L, 11L))
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[graft.streaming.UserEvent]
    val out = graft.streaming.Streaming.sessionizeStateful(ms.toDS(), gapMs = 600000L)
    s.catalog.dropTempView("t_mem_sessions")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("t_mem_sessions").start()
    try {
      // batch 1: two events 1 min apart -> one open session
      ms.addData(graft.streaming.UserEvent(7L, 0L, 1.0),
        graft.streaming.UserEvent(7L, 60000L, 2.0))
      q.processAllAvailable()
      assert(s.table("t_mem_sessions").count() === 0) // still open
      // batch 2: event 20 min later -> closes the first session
      ms.addData(graft.streaming.UserEvent(7L, 1260000L, 5.0))
      q.processAllAvailable()
      val sessions = s.table("t_mem_sessions").collect()
      assert(sessions.length === 1)
      val ses = sessions.head
      assert(ses.getAs[Long]("session_start_ms") === 0L)
      assert(ses.getAs[Long]("session_end_ms") === 660000L) // last + gap
      assert(ses.getAs[Long]("n_events") === 2L)
      assert(ses.getAs[Double]("total_value") === 3.0)
    } finally q.stop()
  }

  test("file-source streaming tumbling equals the batch events aggregation") {
    val streamed = Streaming.streamTumbling(spark, sf).collect()
    val batch = operators.EventsOps.tumbling(spark, sf).collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }
}
