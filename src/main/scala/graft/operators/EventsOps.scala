package graft.operators

import graft.Exact.dec
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table — the batch twins of the
  * Structured Streaming operators in [[graft.streaming.Streaming]] (same
  * logical aggregations, so the streaming results are oracle-checkable
  * against these).
  *
  * The reference's only streaming semantics are queue polling with
  * at-least-once redelivery and no windows/state (SURVEY.md §2.2
  * "Streaming"); the engine provides real event-time processing: tumbling/
  * sliding/session windows and exactly-once dedup (which repairs the
  * reference's duplicate-redelivery bug, SURVEY.md §A Q4).
  *
  * Window starts are surfaced as epoch milliseconds (bigint) — exact in
  * both engines, no timestamp-precision comparison hazards.
  */
object EventsOps {

  private val HOUR_MS = 3600000L
  private val HALF_HOUR_MS = 1800000L

  /** Tumbling 1-hour windows per event type. */
  def tumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"), 12, 2)).cast("double").as("total_value"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        unix_millis(col("w.end")).as("window_end_ms"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("window_start_ms"), col("event_type"))

  /** Sliding 1-hour windows, 30-minute hop (each event lands in 2). */
  def sliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        unix_millis(col("w.end")).as("window_end_ms"),
        col("event_type"), col("n"))
      .orderBy(col("window_start_ms"), col("event_type"))

  /** Session windows per user, 10-minute inactivity gap. */
  def session(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"), 12, 2)).cast("double").as("total_value"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start_ms"))

  /** Exactly-once repair of at-least-once delivery: duplicate a slice of
    * the stream (the reference's visibility-timeout redelivery, SURVEY.md
    * §A Q4), then full-row distinct restores one row per event. */
  def dedup(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      col("event_id"), unix_millis(col("ts")).as("ts_ms"),
      col("user_id"), col("event_type"), col("value"))
    e.union(e.filter(col("event_id") % 10 === 0))
      .distinct()
      .orderBy(col("event_id"))
  }

  /** Canonical-row dedup under DIVERGENT redelivery: the reference's
    * at-least-once bug (SURVEY.md §A Q4) can deliver a second result for
    * the same task with a different payload (different worker, different
    * artifact id) — full-row distinct keeps BOTH. The repair is keep-first
    * by a deterministic rule: rank replicas per key and keep rank 1.
    * Simulated by unioning a mutated replica (+1000 value, 'replay' tag)
    * for every 10th event; the canonical pick is the lowest
    * (value, event_type) per event_id. */
  def dedupKeepFirst(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      col("event_id"), unix_millis(col("ts")).as("ts_ms"),
      col("user_id"), col("event_type"), col("value"))
    val replayed = e.filter(col("event_id") % 10 === 0)
      .withColumn("value", col("value") + 1000.0)
      .withColumn("event_type", lit("replay"))
    val all = e.union(replayed)
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("value"), col("event_type"))
    all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("ts_ms"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** Streaming leaderboard shape: top event type per hour (window agg +
    * ranking window on top). */
  def hourlyTop(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("hour_ms"), col("event_type"), col("n"))
    val w = Window.partitionBy(col("hour_ms"))
      .orderBy(col("n").desc, col("event_type"))
    hourly.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("hour_ms"), col("event_type"), col("n"))
      .orderBy(col("hour_ms"))
  }

  /** As-of join, composed the scalable way: instead of a per-row range
    * join (quadratic blowup), union both sides into one event-time stream
    * and carry the last purchase timestamp forward with an ignore-nulls
    * last_value window — one shuffle on the key, linear in events. For
    * each 'error' event: the same user's most recent 'purchase' at or
    * before it. (DuckDB's native ASOF JOIN has different tie semantics at
    * equal timestamps, so the oracle mirrors this window formulation.) */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("purchase_ts",
        when(col("event_type") === "purchase", col("ts_ms")))
      .withColumn("last_purchase_ms", last(col("purchase_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("last_purchase_ms"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (asofJoin _),
    "q_events_tumbling" -> (tumbling _),
    "q_events_sliding" -> (sliding _),
    "q_events_session" -> (session _),
    "q_events_dedup" -> (dedup _),
    "q_events_dedup_keep_first" -> (dedupKeepFirst _),
    "q_events_hourly_top" -> (hourlyTop _)
  )

  val tumblingOracle: String =
    s"""SELECT (epoch_ms(ts) // $HOUR_MS) * $HOUR_MS AS window_start_ms,
      |  (epoch_ms(ts) // $HOUR_MS) * $HOUR_MS + $HOUR_MS AS window_end_ms,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2, 3
      |ORDER BY window_start_ms, event_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |m AS (
        |  SELECT user_id, event_id, event_type, ts_ms,
        |    last_value(CASE WHEN event_type = 'purchase' THEN ts_ms END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ms
        |  FROM e)
        |SELECT user_id, event_id, ts_ms, last_purchase_ms
        |FROM m WHERE event_type = 'error' ORDER BY event_id""".stripMargin,

    "q_events_tumbling" -> tumblingOracle,

    "q_events_sliding" ->
      s"""SELECT ws AS window_start_ms, ws + $HOUR_MS AS window_end_ms,
        |  event_type, COUNT(*) AS n
        |FROM (
        |  SELECT (epoch_ms(ts) // $HALF_HOUR_MS) * $HALF_HOUR_MS - k * $HALF_HOUR_MS AS ws,
        |    event_type
        |  FROM events, range(0, 2) r(k))
        |GROUP BY 1, 2, 3 ORDER BY window_start_ms, event_type""".stripMargin,

    "q_events_session" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events),
        |o AS (
        |  SELECT user_id, ms, value,
        |    LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
        |  FROM e),
        |f AS (
        |  SELECT user_id, ms, value,
        |    CASE WHEN prev IS NULL OR ms - prev >= 600000 THEN 1 ELSE 0 END AS new_s
        |  FROM o),
        |g AS (
        |  SELECT user_id, ms, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id,
        |  MIN(ms) AS session_start_ms,
        |  MAX(ms) + 600000 AS session_end_ms,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin,

    "q_events_dedup" ->
      """SELECT DISTINCT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |FROM (
        |  SELECT * FROM events
        |  UNION ALL SELECT * FROM events WHERE event_id % 10 = 0)
        |ORDER BY event_id""".stripMargin,

    "q_events_dedup_keep_first" ->
      """WITH e AS (
        |  SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |  FROM events),
        |allrows AS (
        |  SELECT * FROM e
        |  UNION ALL
        |  SELECT event_id, ts_ms, user_id, 'replay' AS event_type, value + 1000.0 AS value
        |  FROM e WHERE event_id % 10 = 0),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
        |    ORDER BY value, event_type) AS rn
        |  FROM allrows)
        |SELECT event_id, ts_ms, user_id, event_type, value
        |FROM r WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_events_hourly_top" ->
      s"""WITH hourly AS (
        |  SELECT (epoch_ms(ts) // $HOUR_MS) * $HOUR_MS AS hour_ms,
        |    event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT hour_ms, event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY hour_ms ORDER BY n DESC, event_type) AS rn
        |  FROM hourly)
        |SELECT hour_ms, event_type, n FROM r WHERE rn = 1 ORDER BY hour_ms""".stripMargin
  )
}
