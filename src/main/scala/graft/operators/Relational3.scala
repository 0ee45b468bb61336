package graft.operators

import graft.Exact.{dec, dec2}
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Third tranche: deep relational shapes — the long join chain, correlated
  * subqueries (Catalyst decorrelation), range window frames, bucketed
  * co-located joins, and partitioned sinks with partition pruning.
  */
object Relational3 {

  /** TPC-H Q5 shape: 6-table star chain (region→nation→{customer,supplier}
    * →orders→lineitem) with the local-supplier correlation
    * (c_nationkey = s_nationkey). Dims broadcast; the only fact shuffle is
    * orders↔lineitem on the order key. */
  def q5Region(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d).filter(col("r_name") === "ASIA")
    val n = nation(s, d)
    val c = customer(s, d)
    val o = orders(s, d).filter(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(s, d)
    val sup = supplier(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(c),
        o("o_custkey") === c("c_custkey") &&
        sup("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice"), 12, 2) *
          (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"), 3, 2)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q4 shape: correlated EXISTS with an inequality — Catalyst
    * decorrelates it into a left-semi join, no per-row subquery execution. */
  def existsCorrelated(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_orders_q4")
    lineitem(s, d).createOrReplaceTempView("graft_lineitem_q4")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM graft_orders_q4
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM graft_lineitem_q4
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** RANGE window frame: 30-day trailing spend per customer (peers at the
    * same day aggregate together — deterministic under date ties, unlike a
    * ROWS frame). */
  def windowRange(s: SparkSession, d: String): DataFrame = {
    val withDays = orders(s, d)
      .withColumn("day_no",
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_no"))
      .rangeBetween(-30, 0)
    withDays
      .withColumn("trailing_30d",
        sum(dec(col("o_totalprice"), 12, 2)).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("day_no"),
        col("o_totalprice"), col("trailing_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Bucketed co-located join: both fact tables written bucketed+sorted on
    * the join key, then joined WITHOUT a shuffle (the sort-merge join reads
    * bucket-aligned files; `.explain` shows no Exchange above the scans).
    * This is the 100 TB answer to repeated fact-fact joins: pay the
    * partitioning once at write time, never at query time. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val base = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_warehouse").toString
    def writeBucketed(df: DataFrame, table: String, key: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $table")
      // one file per bucket (repartition on the bucket key) — Spark only
      // trusts per-bucket sort order when a bucket is a single file, which
      // is what eliminates the Sort below the join as well as the Exchange
      df.repartition(8, col(key)).write.mode("overwrite")
        .bucketBy(8, key).sortBy(key)
        .option("path", s"$base/$table")
        .format("parquet")
        .saveAsTable(table)
    }
    writeBucketed(lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      "graft_li_bkt", "l_orderkey")
    writeBucketed(orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus")),
      "graft_ord_bkt", "o_orderkey")
    // merge hint: at this test SF Catalyst would broadcast the small side,
    // hiding the point — at 100 TB neither side broadcasts, and the
    // bucket-aligned sort-merge join below runs with NO exchange and NO
    // sort (both pre-bucketed and pre-sorted on the key). Exchange
    // elision comes from bucketing alone; SORT elision additionally needs
    // the scan to expose its per-bucket order, which Spark only does with
    // this flag set AND exactly one file per bucket (the repartition
    // above) — PlanHygieneSpec pins both elisions.
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    s.table("graft_li_bkt").hint("merge")
      .join(s.table("graft_ord_bkt"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice"), 12, 2) *
            (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"), 3, 2)))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  /** Partitioned parquet sink + partition-pruned read: orders written
    * partitioned by year, read back with a partition filter (only the 1997
    * directory is scanned — `.explain` shows PartitionFilters). */
  def partitionedSink(s: SparkSession, d: String): DataFrame = {
    val out = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_part_orders_${math.abs(d.hashCode)}").toString
    orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    s.read.parquet(out)
      .filter(col("o_year") === 1997)
      .groupBy(month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"), 12, 2)).cast("double").as("total"))
      .orderBy(col("o_month"))
  }

  /** Top-3 orders per customer via the bounded-heap typed Aggregator
    * (state O(k) per group, map-side partials — see
    * [[graft.functions.TopKAggregator]]) instead of a full window sort.
    * Oracle-checked to equal the row_number window form exactly. */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val topk = new graft.functions.TopKAggregator(3)
    orders(s, d)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topk.toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"),
        col("col._2").as("o_orderkey"),
        col("col._1").as("o_totalprice"),
        (col("pos") + 1).cast("long").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** TPC-H Q6 shape: single-table filter + agg — the pushdown benchmark
    * (every predicate reaches the parquet scan). */
  def q6Forecast(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice"), 12, 2) * dec(col("l_discount"), 3, 2))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))

  /** TPC-H Q12 shape: join + conditional two-way agg (CASE inside SUM). */
  def q12Priority(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d).filter(
      col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
      col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = orders(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q14 shape: conditional revenue ratio (promo share). */
  def q14Promo(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d).filter(
      col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
      col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
    val p = part(s, d)
    val rev = dec(col("l_extendedprice"), 12, 2) *
      (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"), 3, 2))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(16, 4))))
          .cast("double") * 100.0 /
         sum(rev).cast("double")).as("promo_revenue_pct"),
        count(lit(1)).as("n"))
  }

  /** Top-3 per customer through the CUSTOM PHYSICAL OPERATOR
    * (graft.plans.TopKPerGroup: LogicalPlan + Strategy + Exec) — one hash
    * exchange, bounded per-group selection, no sort. Oracle-checked equal
    * to the window form; the Aggregator and window variants of the same
    * semantics live in q_topk_per_group / q_window_rank. */
  def topkCustomOp(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.TopKPerGroupOp.topK(base, "o_custkey", "o_totalprice", "o_orderkey", 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** The window IDIOM planned through the custom operator BY THE OPTIMIZER
    * ([[graft.plans.TopKRewriteRule]]): the query is written exactly as a
    * user writes top-k-per-group — row_number window, filter, drop — and
    * the injected Rule[LogicalPlan] collapses it to TopKPerGroupExec (no
    * sort, no Window; one exchange + O(k) heaps). Same oracle as the
    * explicit-API form; TopKPlanSpec asserts the rewrite actually fired. */
  def topkRewrite(s: SparkSession, d: String): DataFrame = {
    graft.plans.TopKPerGroupOp.ensureRegistered(s)
    import org.apache.spark.sql.expressions.Window
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Range (band) join: facts joined to a broadcast interval table on an
    * inequality — the classic banding/point-in-interval join shape. The
    * band side is tiny so Catalyst's nested-loop over a broadcast is the
    * right plan (each fact row scans 5 intervals in registers); at scale
    * the fact side never shuffles — only the final per-band partial agg
    * does. */
  def bandJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (0, 0.00, 0.02), (1, 0.02, 0.04), (2, 0.04, 0.06),
      (3, 0.06, 0.08), (4, 0.08, 1.00)
    ).toDF("band_id", "lo", "hi")
    lineitem(s, d)
      .join(broadcast(bands),
        col("l_discount") >= col("lo") && col("l_discount") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"), 12, 2)).cast("double").as("sum_qty"))
      .orderBy(col("band_id"))
  }

  /** UNPIVOT (wide metrics → long key/value): `Dataset.unpivot`, the
    * inverse of pivot — the feature-store export shape. Narrow per-row
    * expansion after a partial-agg groupBy; no extra shuffle beyond the
    * aggregation's own. */
  def unpivotMetrics(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec(col("l_quantity"), 12, 2)).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
        count(lit(1)).cast("double").as("n_rows"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_rows")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))

  /** Equi-width histogram via `width_bucket` — 10 buckets over the
    * quantity domain [1, 51). Bucketing is a per-row codegen'd expression;
    * the count is one partial-agg shuffle on ≤ 12 keys. (The oracle spells
    * the same bucket arithmetic explicitly — DuckDB has no width_bucket.) */
  def histogram(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(expr("width_bucket(l_quantity, 1.0D, 51.0D, 10)").as("bucket"),
        col("l_quantity"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
      .orderBy(col("bucket"))

  /** MERGE INTO (upsert / CDC-apply) emulated on the open surface: a
    * change feed (updates to existing keys + brand-new keys) applied to a
    * base table via ONE full-outer join on the merge key — matched rows
    * take the update, unmatched-by-source rows keep the base, unmatched-
    * by-target rows insert. This is the SCD/ingest primitive lakehouse
    * formats wrap; on plain parquet the engine expresses it as a
    * declarative join + coalesce and rewrites the partition. One key
    * shuffle; at 100 TB bucketing/partitioning on the merge key turns it
    * into a co-located join plus partition-scoped rewrite. Money stays in
    * decimals until the final cast. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d).filter(col("o_orderkey") % 10 < 8)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val changes = orders(s, d).filter(col("o_orderkey") % 10 < 4)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (dec(col("o_totalprice"), 12, 2) + dec(lit(10.00), 4, 2))
          .cast("double").as("o_totalprice"))
      // insert keys offset by 1<<40 — far beyond any real orderkey at any
      // SF (TPC-H max orderkey = 6M×SF), so synthesized inserts can never
      // collide with base keys and silently become duplicate-key updates
      .union(orders(s, d).filter(col("o_orderkey") % 10 >= 8)
        .select((col("o_orderkey") + (1L << 40)).as("o_orderkey"),
          lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice")))
    base.as("b")
      .join(changes.as("u"), col("b.o_orderkey") === col("u.o_orderkey"), "full_outer")
      .select(
        coalesce(col("u.o_orderstatus"), col("b.o_orderstatus")).as("st"),
        coalesce(col("u.o_totalprice"), col("b.o_totalprice")).as("p"))
      .groupBy(col("st"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("p"), 14, 2)).cast("double").as("total"))
      .orderBy(col("st"))
  }

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_upsert" -> (mergeUpsert _),
    "q_unpivot" -> (unpivotMetrics _),
    "q_histogram" -> (histogram _),
    "q_band_join" -> (bandJoin _),
    "q_topk_custom_op" -> (topkCustomOp _),
    "q_topk_rewrite" -> (topkRewrite _),
    "q6_forecast" -> (q6Forecast _),
    "q12_priority" -> (q12Priority _),
    "q14_promo" -> (q14Promo _),
    "q_topk_per_group" -> (topkPerGroup _),
    "q5_region" -> (q5Region _),
    "q_exists_correlated" -> (existsCorrelated _),
    "q_window_range" -> (windowRange _),
    "q_bucketed_join" -> (bucketedJoin _),
    "q_partitioned_sink" -> (partitionedSink _)
  )

  val oracle: Map[String, String] = Map(
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 10 < 8),
        |changes AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 10.00 AS DOUBLE) AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 < 4
        |  UNION ALL
        |  SELECT o_orderkey + 1099511627776, 'N', 1.0
        |  FROM orders WHERE o_orderkey % 10 >= 8),
        |merged AS (
        |  SELECT COALESCE(u.o_orderstatus, b.o_orderstatus) AS st,
        |    COALESCE(u.o_totalprice, b.o_totalprice) AS p
        |  FROM base b FULL OUTER JOIN changes u ON b.o_orderkey = u.o_orderkey)
        |SELECT st, COUNT(*) AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM merged GROUP BY st ORDER BY st""".stripMargin,

    "q_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |    CAST(COUNT(*) AS DOUBLE) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |  UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM a)
        |ORDER BY l_returnflag, metric""".stripMargin,

    // width_bucket(q, 1, 51, 10) = floor((q-1)/5)+1 for q in [1,51) —
    // the whole quantity domain, so the arithmetic form is exact
    "q_histogram" ->
      """SELECT CAST(FLOOR((l_quantity - 1.0) / 5.0) AS BIGINT) + 1 AS bucket,
        |  COUNT(*) AS n, MIN(l_quantity) AS lo, MAX(l_quantity) AS hi
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_band_join" ->
      """WITH bands(band_id, lo, hi) AS (VALUES
        |  (0, 0.00, 0.02), (1, 0.02, 0.04), (2, 0.04, 0.06),
        |  (3, 0.06, 0.08), (4, 0.08, 1.00))
        |SELECT band_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN bands ON l_discount >= lo AND l_discount < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,

    "q_topk_rewrite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q_topk_custom_op" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q6_forecast" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q12_priority" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q14_promo" ->
      """SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |    ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) * 100.0
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS promo_revenue_pct,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-06-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q5_region" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_exists_correlated" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, day_no, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY day_no
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_no
        |  FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_bucketed_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_partitioned_sink" ->
      """SELECT CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY 1 ORDER BY o_month""".stripMargin
  )
}
