package graft.operators

import graft.Exact.dec
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second tranche of relational surface: exact percentiles, pivot,
  * grouping sets, generator (explode) queries, and scalar subqueries.
  * All Catalyst built-ins; see Relational.scala for the first tranche.
  */
object Relational2 {

  /** Exact percentiles (interpolated) per group. At 100 TB you'd switch to
    * approx_percentile sketches; the exact form is the oracle-able baseline. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** PIVOT: linestatus breakdown as columns per returnflag. */
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .orderBy(col("l_returnflag"))

  /** VARIANT (Spark 4's semi-structured type): `props` parsed ONCE into
    * the open binary encoding, fields extracted with `variant_get` path
    * expressions — unlike `get_json_object` (string re-parse per access)
    * or `from_json` (rigid schema up front), variant keeps the document
    * open-schema while storing it pre-parsed, which is why lakehouse
    * engines shred it columnar at scale. Semantics (not encoding) are
    * oracle-checked against DuckDB's JSON path extraction. */
  def variantProps(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
        // a missing path is SQL NULL under try_variant_get — the
        // open-schema behavior rigid from_json can't give
        expr("try_variant_get(parse_json(props), '$.missing', 'long')").as("miss"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        count(col("miss")).as("n_missing_present"))
      .orderBy(col("event_type"))

  /** LATERAL correlated subquery: top-2 nations per region by name — the
    * SQL-standard per-group limit (the DataFrame twin is q_topk_group /
    * the TopKRewriteRule path). */
  def lateralTopN(s: SparkSession, d: String): DataFrame = {
    region(s, d).createOrReplaceTempView("graft_region_lat")
    nation(s, d).createOrReplaceTempView("graft_nation_lat")
    s.sql(
      """SELECT r.r_name, t.n_name, t.n_nationkey
        |FROM graft_region_lat r,
        |  LATERAL (SELECT n_name, n_nationkey FROM graft_nation_lat n
        |           WHERE n.n_regionkey = r.r_regionkey
        |           ORDER BY n_name, n_nationkey LIMIT 2) t
        |ORDER BY r.r_name, t.n_name""".stripMargin)
  }

  /** Recursive CTE (new in Spark 4): transitive walk of a successor
    * chain — each region's nations ordered by key form the edges, the
    * recursion walks from the region's first nation accumulating depth.
    * This is the DECLARATIVE form of the iterate-until-fixpoint loops
    * the engine hand-rolls where scale demands control
    * ([[Dedup.dedupClusters]]' contracted label propagation); here the
    * planner owns the loop. Depth is bounded by region size, and both
    * engines implement standard UNION ALL recursion, so the oracle is
    * the same SQL. */
  def recursiveChain(s: SparkSession, d: String): DataFrame = {
    nation(s, d).createOrReplaceTempView("graft_nation_rec")
    s.sql(
      """WITH RECURSIVE ordered AS (
        |  SELECT n_regionkey, n_nationkey, n_name,
        |    ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
        |  FROM graft_nation_rec),
        |edges AS (
        |  SELECT a.n_regionkey AS rk, a.n_nationkey AS src, b.n_nationkey AS dst
        |  FROM ordered a JOIN ordered b
        |    ON a.n_regionkey = b.n_regionkey AND b.rn = a.rn + 1),
        |reach(rk, node, depth) AS (
        |  SELECT n_regionkey, n_nationkey, CAST(0 AS BIGINT) FROM ordered WHERE rn = 1
        |  UNION ALL
        |  SELECT e.rk, e.dst, r.depth + 1
        |  FROM reach r JOIN edges e ON e.rk = r.rk AND e.src = r.node)
        |SELECT r.rk AS r_regionkey, o.n_name, r.depth
        |FROM reach r JOIN ordered o ON r.node = o.n_nationkey
        |ORDER BY r.rk, r.depth""".stripMargin)
  }

  /** GROUPING SETS ((flag), (status), ()) via SQL. */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("graft_lineitem_gs")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM graft_lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin)
  }

  /** Generator/UDTF surface: explode the token stream, global top-20. */
  def explodeTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(expr("split(text, ' ')")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** Scalar subquery: orders priced over 1.8x the (exact-decimal) average. */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_orders_ss")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM graft_orders_ss
        |WHERE o_totalprice > 1.8 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |  FROM graft_orders_ss)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Skew-safe two-phase aggregation: the 3-value l_returnflag key is the
    * canonical hot-key skew case — a plain groupBy funnels ~20M rows per
    * key through 3 reducers at 100 TB. Salting fans each hot key over 16
    * sub-keys for the partial phase, then combines; decimal sums make the
    * re-aggregation exact, so results equal the direct groupBy (which is
    * what the oracle checks). AQE's skew handling covers joins; salting is
    * the aggregation-side tool. */
  def saltedAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        sum(dec(col("l_quantity"), 12, 2)).as("part_qty"),
        count(lit(1)).as("part_n"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("part_qty")).cast("double").as("sum_qty"),
        sum(col("part_n")).as("n"))
      .orderBy(col("l_returnflag"))

  /** Higher-order array functions (transform / filter / aggregate /
    * zip_with-equivalent index comparison) over the embedding column. */
  def higherOrderFns(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(
        col("vec_id"),
        expr("size(filter(embedding, x -> x >= 0))").cast("long").as("n_pos"),
        expr("element_at(transform(embedding, x -> CAST(x AS DOUBLE) * 2.0), 1)").as("scaled_first"),
        expr("aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))").as("sum_fold"),
        expr("""size(filter(sequence(1, 64), i ->
          element_at(embedding, CAST(i AS INT)) < element_at(embedding, CAST(65 - i AS INT))))""")
          .cast("long").as("n_lt_mirror"))
      .orderBy(col("vec_id"))

  /** Map-type functions: JSON → map<string,bigint> → key/value access. */
  def mapFns(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_id") < 500)
      .select(
        col("event_id"),
        expr("size(map_keys(from_json(props, 'map<string,bigint>')))").cast("long").as("n_keys"),
        expr("element_at(from_json(props, 'map<string,bigint>'), 'k')").as("k_val"),
        expr("array_contains(map_keys(from_json(props, 'map<string,bigint>')), 'k')").as("has_k"))
      .orderBy(col("event_id"))

  /** Null semantics battery: outer-join nulls through coalesce / nullif /
    * null-aware counting — count(col) skips nulls, count(*) doesn't;
    * aggregates over all-null groups stay null until coalesced. */
  def nullSemantics(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d)
    val c = customer(s, d)
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
      .groupBy(col("n_nationkey"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("c_custkey")).as("n_nonnull"),
        coalesce(max(col("c_acctbal")), lit(-1.0)).as("max_bal_or_neg1"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_null"),
        max(nullif(col("c_mktsegment"), lit("BUILDING"))).as("max_seg_not_building"))
      .orderBy(col("n_nationkey"))
  }

  /** UNION ALL (bag semantics — the distinct form lives in q_set_union). */
  def unionAll(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").cast("long").as("nk"))
      .union(supplier(s, d).select(col("s_nationkey").cast("long").as("nk")))
      .groupBy(col("nk")).agg(count(lit(1)).as("n"))
      .orderBy(col("nk"))

  // --------------------------------------------------------------- wiring

  /** TPC-H Q13 shape THROUGH THE SQL FRONT DOOR: temp views + `spark.sql`
    * end to end — the declarative surface a reference user would migrate
    * their query text onto. Left join (customers without orders survive
    * with count 0) feeding a second aggregation over the first's result —
    * two exchanges, both partial-agg; the custkey join is the only
    * fact-fact shuffle. */
  def q13Custdist(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("graft_q13_customer")
    orders(s, d).createOrReplaceTempView("graft_q13_orders")
    s.sql(
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM graft_q13_customer c
        |  LEFT JOIN graft_q13_orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** Distribution window functions: percent_rank drives per-group
    * quartiles (q1/median/q3 as the max value at or below each rank
    * fraction). percent_rank = (rank-1)/(N-1) is exact integer-ratio
    * arithmetic, so both engines agree bit-for-bit even with heavy ties.
    * One window sort per group + one partial agg. */
  def windowQuartiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    lineitem(s, d)
      .withColumn("pr", percent_rank().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))))
      .groupBy(col("l_returnflag"))
      .agg(
        max(when(col("pr") <= 0.25, col("l_quantity"))).as("q1"),
        max(when(col("pr") <= 0.5, col("l_quantity"))).as("median"),
        max(when(col("pr") <= 0.75, col("l_quantity"))).as("q3"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_quartiles" -> (windowQuartiles _),
    "q13_custdist" -> (q13Custdist _),
    "q_null_semantics" -> (nullSemantics _),
    "q_union_all" -> (unionAll _),
    "q_higher_order_fns" -> (higherOrderFns _),
    "q_map_fns" -> (mapFns _),
    "q_salted_agg" -> (saltedAgg _),
    "q_percentiles" -> (percentiles _),
    "q_pivot" -> (pivotStatus _),
    "q_grouping_sets" -> (groupingSets _),
    "q_explode_tokens" -> (explodeTokens _),
    "q_scalar_subquery" -> (scalarSubquery _),
    "q_variant_props" -> (variantProps _),
    "q_lateral_topn" -> (lateralTopN _),
    "q_recursive_chain" -> (recursiveChain _)
  )

  val oracle: Map[String, String] = Map(
    "q_variant_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  COUNT(CAST(json_extract_string(props, '$.missing') AS BIGINT)) AS n_missing_present
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_lateral_topn" ->
      """SELECT r.r_name, t.n_name, t.n_nationkey
        |FROM region r,
        |  LATERAL (SELECT n_name, n_nationkey FROM nation n
        |           WHERE n.n_regionkey = r.r_regionkey
        |           ORDER BY n_name, n_nationkey LIMIT 2) t
        |ORDER BY r.r_name, t.n_name""".stripMargin,

    "q_recursive_chain" ->
      """WITH RECURSIVE ordered AS (
        |  SELECT n_regionkey, n_nationkey, n_name,
        |    ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
        |  FROM nation),
        |edges AS (
        |  SELECT a.n_regionkey AS rk, a.n_nationkey AS src, b.n_nationkey AS dst
        |  FROM ordered a JOIN ordered b
        |    ON a.n_regionkey = b.n_regionkey AND b.rn = a.rn + 1),
        |reach(rk, node, depth) AS (
        |  SELECT n_regionkey, n_nationkey, CAST(0 AS BIGINT) FROM ordered WHERE rn = 1
        |  UNION ALL
        |  SELECT e.rk, e.dst, r.depth + 1
        |  FROM reach r JOIN edges e ON e.rk = r.rk AND e.src = r.node)
        |SELECT r.rk AS r_regionkey, o.n_name, r.depth
        |FROM reach r JOIN ordered o ON r.node = o.n_nationkey
        |ORDER BY r.rk, r.depth""".stripMargin,

    "q_window_quartiles" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    PERCENT_RANK() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity) AS pr
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  MAX(CASE WHEN pr <= 0.25 THEN l_quantity END) AS q1,
        |  MAX(CASE WHEN pr <= 0.5 THEN l_quantity END) AS median,
        |  MAX(CASE WHEN pr <= 0.75 THEN l_quantity END) AS q3,
        |  COUNT(*) AS n
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_null_semantics" ->
      """SELECT n_nationkey,
        |  COUNT(*) AS n_rows,
        |  COUNT(c_custkey) AS n_nonnull,
        |  coalesce(MAX(c_acctbal), -1.0) AS max_bal_or_neg1,
        |  CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  MAX(nullif(c_mktsegment, 'BUILDING')) AS max_seg_not_building
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin,

    "q_union_all" ->
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,

    "q_higher_order_fns" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x >= 0)) AS BIGINT) AS n_pos,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)[1] AS scaled_first,
        |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS sum_fold,
        |  CAST(len(list_filter(range(1, 65), i -> embedding[i] < embedding[65 - i])) AS BIGINT) AS n_lt_mirror
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_map_fns" ->
      """SELECT event_id,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  list_contains(json_keys(props), 'k') AS has_k
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,

    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin,

    "q_explode_tokens" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > 1.8 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin
  )
}
