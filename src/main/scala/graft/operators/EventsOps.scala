package graft.operators

import graft.Exact.dec
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Sign-correct FLOOR division of epoch-ms into `unit`-sized buckets.
    * Spark's `div` truncates toward zero while the oracle's `//` floors —
    * the two diverge on pre-1970 (negative epoch-ms) timestamps. The
    * floor-mod numerator is an exact multiple of `unit`, so the final
    * `div` is exact for any sign. Bucket INDEX (e.g. hour number). */
  private[graft] def floorBucket(msExpr: String, unit: Long) =
    expr(s"(($msExpr) - ((($msExpr) % $unit + $unit) % $unit)) div $unit")

  /** Same floor bucketing, but returning the bucket START in epoch-ms. */
  private[graft] def floorBucketMs(msExpr: String, unit: Long) =
    expr(s"($msExpr) - ((($msExpr) % $unit + $unit) % $unit)")

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

  /** SCD Type-2 history build: collapse each user's event stream into
    * versioned `event_type` intervals — a new version opens whenever the
    * type CHANGES (run-length encoding of the dimension), `valid_to_ms`
    * is the next version's start, and the open current version carries
    * the sentinel -1 (a NULL would be semantically right but nullable
    * columns are a cross-engine compare hazard; -1 is impossible as an
    * epoch-ms here). This is the warehouse dimension-history primitive
    * MERGE-based SCD pipelines maintain incrementally; built from a
    * snapshot it is two windows over the SAME (user_id, time) ordering —
    * one shuffle, both windows pipelined in a single sort, no self-join.
    * Ties break on event_id for full determinism. */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byTime))
      .filter(col("prev_type").isNull || col("event_type") =!= col("prev_type"))
      .withColumn("version", row_number().over(byTime))
      .withColumn("valid_to_ms",
        coalesce(lead(col("ms"), 1).over(byTime), lit(-1L)))
      .select(col("user_id"), col("version"), col("event_type"),
        col("ms").as("valid_from_ms"), col("valid_to_ms"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Strict-sequence FUNNEL: view → click-after-that-view →
    * purchase-after-that-click, per user, reported as the classic
    * step-conversion counts. Each step's timestamp is the MIN event time
    * strictly after the previous step's (ties at the same ms don't
    * advance the funnel — event order within a ms is not knowable).
    *
    * Scale shape: three whole-frame window aggregates over the SAME
    * `user_id` partitioning — ONE exchange, no sort (unordered frames),
    * then a collapse to one row per user (t1/t2/t3 are per-user constants
    * after the windows, and the groupBy rides the window's hash
    * partitioning — no new exchange) and a global single-row COUNT over
    * the per-user rows. The collapse is why the final aggregate is plain
    * `count`, not `countDistinct`: four multi-distincts over the windowed
    * stream would plan an Expand that quadruples the rows into the final
    * exchange (EventsSpec pins the Expand-free plan). The alternative
    * (per-step aggregate + join back per step) pays a shuffle per step. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    events(s, d)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_type"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ms"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ms") > col("t1"),
          col("ms"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ms") > col("t2"),
          col("ms"))).over(byUser))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click"),
        count(col("t3")).as("n_purchase"))
  }

  /** COHORT RETENTION matrix: cohort = a user's first active day; cell
    * (cohort_day, day_offset) counts distinct users from that cohort
    * active `offset` days later — the standard DAU-retention triangle.
    *
    * Scale shape: distinct on (user, day) collapses the event stream to
    * at most |users|×|days| rows FIRST (partial-agg, map-side combined),
    * the cohort day rides a whole-frame window on the user partitioning,
    * and the final matrix is tiny. No join back to the raw stream. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val DAY_MS = 86400000L
    events(s, d)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
      .select(col("user_id"), floorBucket("ms", DAY_MS).as("day"))
      .distinct()
      .withColumn("cohort_day",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** CHANGELOG COMPACTION (the Kafka log-compaction / CDC-materialize
    * primitive): the event stream is a change log keyed by user; the
    * latest change wins, and a trailing 'error' acts as a TOMBSTONE that
    * deletes the key from the compacted snapshot.
    *
    * Deliberately NOT the row_number()=1 formulation: `max(struct(...))`
    * picks the latest (ms, event_id, ...) lexicographically inside a
    * partial-aggregatable hash agg — map-side combine reduces each
    * upstream partition to one row per key BEFORE the exchange, and no
    * per-key sort ever happens. At 100 TB that's the difference between
    * shuffling the full log and shuffling ~|keys| rows. */
  def changelogCompact(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("ms"), col("event_id"), col("event_type"), col("value")))
          .as("last"),
        count(lit(1)).as("n_changes"))
      .filter(col("last.event_type") =!= "error")
      .select(col("user_id"), col("last.ms").as("last_ms"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"), col("n_changes"))
      .orderBy(col("user_id"))

  /** Z-SCORE anomaly flags in EXACT integer arithmetic: an event is
    * anomalous when |value − μ(type)| > 2σ(type). The float formulation
    * is a cross-engine hazard (σ is a sqrt, μ a division), so the
    * predicate is cross-multiplied into integers over cents:
    * `(c·n − s)² > 4·(q·n − s²)` with s=Σc, q=Σc² — bit-identical in any
    * engine with exact wide integers (decimal(38) here, HUGEINT in the
    * oracle). Per-type stats are a 5-row partial-agg broadcast back onto
    * the stream: one scan, one tiny exchange, no window over the table.
    *
    * Overflow stance: every product is capped at Spark's decimal(38), so
    * the identity holds only while |c·n|, |q·n| and (c·n−s)² fit 38
    * digits — roughly |value| · n_type < 10¹⁷ cents. Inside that bound
    * the arithmetic is exact; beyond it non-ANSI Spark would yield NULL
    * and a bare filter would SILENTLY drop true anomalies, so the
    * predicate routes any NULL product through `raise_error` — an
    * out-of-range run fails loudly instead of under-reporting (the
    * DuckDB oracle's HUGEINT has no such cliff, which is why silence
    * here would also be a cross-engine divergence). */
  def anomalyZscore(s: SparkSession, d: String): DataFrame =
    anomalyZscoreOf(events(s, d))

  /** [[anomalyZscore]]'s core over any (event_id, event_type, value)
    * frame — the seam the overflow property suite drives both inside
    * the decimal(38) envelope (exact against a BigInt reference) and
    * past it (the raise_error guard must fire, never silently
    * under-report). */
  private[graft] def anomalyZscoreOf(ev: DataFrame): DataFrame = {
    val DEC = DecimalType(19, 0)
    val e = ev
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("value") * 100, 0).cast(DEC).as("c"))
    val stats = e.groupBy(col("event_type")).agg(
      count(lit(1)).cast(DEC).as("n"),
      sum(col("c")).as("s"),
      sum(col("c") * col("c")).as("q"))
    val dev = col("c") * col("n") - col("s")
    val lhs = dev * dev
    val rhs = lit(4) * (col("q") * col("n") - col("s") * col("s"))
    e.join(broadcast(stats), "event_type")
      .filter(when(col("c").isNotNull && (lhs.isNull || rhs.isNull),
          expr("raise_error('anomalyZscore: decimal(38) overflow — " +
            "|value|·n exceeds the exact-arithmetic bound; rerun with " +
            "rescaled cents')").cast("boolean"))
        .otherwise(lhs > rhs))
      .select(col("event_id"), col("event_type"), col("value"),
        when(dev > 0, "high").otherwise("low").as("side"))
      .orderBy(col("event_id"))
  }

  /** ROLLING 3-hour distinct users from MERGEABLE hourly HLL sketches —
    * the time-frame twin of the grouping rollup in `q_agg_hll_merge`:
    * persist one few-KB sketch per hour, answer ANY trailing window by
    * unioning 3 sketches, never re-touching the raw stream. An exact
    * rolling distinct would rescan every event 3× forever; the sketch
    * path reads |hours| rows.
    *
    * Shape: no window function at all — each hourly sketch is exploded
    * to the ≤3 target hours it serves and re-aggregated with
    * `hll_union_agg` (partial-agg, map-side combined, and no
    * single-partition global-order window anywhere). The exact rolling
    * count rides the same expansion on (hour, user) pairs, and the
    * estimate is pinned inside 3×rsd of it (lgConfigK=12 → rsd ≈ 1.6%),
    * the q_agg_approx oracle discipline. */
  def rollingDistinct(s: SparkSession, d: String): DataFrame = {
    val targets = array(lit(0L), lit(1L), lit(2L))
    val e = events(s, d).select(
      floorBucket("unix_millis(ts)", HOUR_MS).as("hour"), col("user_id"))
    val hourly = e.groupBy(col("hour")).agg(
      count(lit(1)).as("n_events"),
      expr("hll_sketch_agg(user_id)").as("sk"))
    val rolled = hourly.select(col("hour"), col("sk"))
      .withColumn("k", explode(targets))
      .select((col("hour") + col("k")).as("hour"), col("sk"))
      .groupBy(col("hour"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
        count(lit(1)).as("n_hours_merged"))
    val exact = e.distinct()
      .withColumn("k", explode(targets))
      .select((col("hour") + col("k")).as("hour"), col("user_id"))
      .groupBy(col("hour"))
      .agg(countDistinct(col("user_id")).as("exact_u3h"))
    hourly.join(rolled, "hour").join(exact, "hour")
      .select(col("hour"), col("n_events"), col("n_hours_merged"),
        col("exact_u3h"),
        (abs(col("est") - col("exact_u3h")) <= col("exact_u3h") * 0.05)
          .as("rolling_within_3rsd"))
      .orderBy(col("hour"))
  }

  /** Time-series RESAMPLE + GAP FILL — regularize each user's event
    * stream onto an hourly grid from their first to last active hour,
    * carrying the last observed purchase value forward across silent
    * hours (`last_value IGNORE NULLS`). This is the
    * missing-observation repair every downstream window/asof consumer
    * assumes has happened: gaps become explicit rows (`is_gap`), and
    * the carried metric is well-defined at every grid point.
    *
    * Determinism: hours are epoch-ms longs; the per-hour carried metric
    * is `max(value)` (order-independent — a float SUM here would be
    * partition-order-dependent), and the fill is a deterministic
    * per-user scan in hour order.
    *
    * Scale shape: one partial-aggregated exchange onto (user, hour) —
    * already ~|active hours| ≪ |events| — then the grid explodes from a
    * 2-row-per-user span frame (never from raw events), and the fill
    * window partitions per user: parallel across users, each partition
    * bounded by the user's span in hours. No global window, no
    * events-sized sort. */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .select(col("user_id"),
        floorBucketMs("unix_millis(ts)", HOUR_MS).as("h"),
        col("event_type"), col("value"))
      .groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n"),
        max(when(col("event_type") === "purchase", col("value"))).as("v"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(expr(s"sequence(h0, h1, $HOUR_MS)")).as("h"))
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h").as("hour_ms"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("h"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("v_fill"),
        col("n").isNull.as("is_gap"))
      .orderBy(col("user_id"), col("hour_ms"))
  }

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gap_fill" -> (gapFill _),
    "q_rolling_distinct" -> (rollingDistinct _),
    "q_events_funnel" -> (funnel _),
    "q_retention_cohort" -> (retention _),
    "q_changelog_compact" -> (changelogCompact _),
    "q_anomaly_zscore" -> (anomalyZscore _),
    "q_scd2_history" -> (scd2History _),
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
    "q_gap_fill" ->
      s"""WITH hourly AS (
        |  SELECT user_id, (epoch_ms(ts) // $HOUR_MS) * $HOUR_MS AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    MAX(CASE WHEN event_type = 'purchase' THEN value END) AS v
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(range(h0, h1 + $HOUR_MS, $HOUR_MS)) AS h
        |  FROM span)
        |SELECT g.user_id, g.h AS hour_ms,
        |  COALESCE(n, CAST(0 AS BIGINT)) AS n_events,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v_fill,
        |  n IS NULL AS is_gap
        |FROM grid g LEFT JOIN hourly t ON g.user_id = t.user_id AND g.h = t.h
        |ORDER BY g.user_id, hour_ms""".stripMargin,

    // exact expansion replayed; the sketch-band boolean pinned TRUE
    "q_rolling_distinct" ->
      s"""WITH e AS (
        |  SELECT epoch_ms(ts) // $HOUR_MS AS hour, user_id FROM events),
        |h AS (SELECT hour, COUNT(*) AS n_events FROM e GROUP BY hour),
        |hx AS (
        |  SELECT h2.hour + k AS hour, COUNT(*) AS n_hours_merged
        |  FROM (SELECT DISTINCT hour FROM e) h2, range(0, 3) r(k)
        |  GROUP BY 1),
        |px AS (
        |  SELECT p.hour + k AS hour, user_id
        |  FROM (SELECT DISTINCT hour, user_id FROM e) p, range(0, 3) r(k)),
        |ex AS (SELECT hour, COUNT(DISTINCT user_id) AS exact_u3h
        |  FROM px GROUP BY hour)
        |SELECT h.hour, h.n_events, hx.n_hours_merged, ex.exact_u3h,
        |  TRUE AS rolling_within_3rsd
        |FROM h JOIN hx USING (hour) JOIN ex USING (hour)
        |ORDER BY hour""".stripMargin,

    "q_events_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events),
        |s1 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ms END)
        |    OVER (PARTITION BY user_id) AS t1 FROM e),
        |s2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ms > t1 THEN ms END)
        |    OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ms > t2 THEN ms END)
        |    OVER (PARTITION BY user_id) AS t3 FROM s2)
        |SELECT COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_view,
        |  COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_click,
        |  COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_purchase
        |FROM s3""".stripMargin,

    "q_retention_cohort" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |c AS (
        |  SELECT user_id, day,
        |    MIN(day) OVER (PARTITION BY user_id) AS cohort_day FROM d)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    // row_number formulation — equivalent because (ms, event_id) is unique
    "q_changelog_compact" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ms DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM events)
        |SELECT user_id, ms AS last_ms, event_type AS last_type,
        |  value AS last_value, n_changes
        |FROM e WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // exact cross-multiplied z-score in HUGEINT — same integers as the
    // engine's decimal(38) path
    "q_anomaly_zscore" ->
      """WITH e AS (
        |  SELECT event_id, event_type, value,
        |    CAST(ROUND(value * 100, 0) AS HUGEINT) AS c FROM events),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(c) AS s, SUM(c * c) AS q
        |  FROM e GROUP BY event_type)
        |SELECT event_id, event_type, value,
        |  CASE WHEN c * n - s > 0 THEN 'high' ELSE 'low' END AS side
        |FROM e JOIN st USING (event_type)
        |WHERE (c * n - s) * (c * n - s) > 4 * (q * n - s * s)
        |ORDER BY event_id""".stripMargin,

    "q_scd2_history" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events),
        |c AS (
        |  SELECT *, LAG(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ms, event_id) AS prev_type
        |  FROM e),
        |f AS (SELECT * FROM c WHERE prev_type IS NULL OR event_type <> prev_type),
        |v AS (
        |  SELECT user_id, ms, event_type,
        |    CAST(ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY ms, event_id) AS INTEGER) AS version,
        |    COALESCE(LEAD(ms) OVER (
        |      PARTITION BY user_id ORDER BY ms, event_id), -1) AS valid_to_ms
        |  FROM f)
        |SELECT user_id, version, event_type, ms AS valid_from_ms, valid_to_ms
        |FROM v ORDER BY user_id, version""".stripMargin,

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
