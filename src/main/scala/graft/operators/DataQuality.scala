package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY audit (the Deequ/Great-Expectations
  * primitive): a battery of constraint checks — completeness, uniqueness,
  * accepted values, value ranges, referential integrity — evaluated in
  * one pass per table and reported as one row per rule with measured
  * violation counts. A 100 TB ingest runs exactly this before
  * publishing a snapshot; rules that scan the same table share ONE scan.
  */
object DataQuality {

  /** Rule battery over orders / lineitem / customer.
    *
    * Scale shape: the four orders rules and the two lineitem rules are
    * single `agg` passes (one scan + one partial-agg exchange each); the
    * per-scan stats are then unpivoted driver-free with `stack`. The two
    * referential rules are conditional counts over a LEFT join against
    * the (distinct) referenced keys — the customer dim broadcasts, the
    * lineitem orderkey set is a partial-agg distinct that shuffles only
    * keys. Nothing collects to the driver; the report is 8 rows. */
  def dqAudit(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val li = lineitem(s, d)
    val c = customer(s, d)

    // ---- orders: one scan, four rules
    val oStats = o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_keys"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("neg_price"))
    val ordersRules = oStats.selectExpr(
      """stack(4,
        |  'complete_o_custkey',   'orders', n, null_cust,
        |  'unique_o_orderkey',    'orders', n, dup_keys,
        |  'accepted_o_orderstatus', 'orders', n, bad_status,
        |  'positive_o_totalprice', 'orders', n, neg_price
        |) AS (rule, tbl, n_checked, n_violations)""".stripMargin)

    // ---- lineitem: one scan, two rules
    val liStats = li.agg(
      count(lit(1)).as("n"),
      sum(when(!col("l_quantity").between(1.0, 50.0), 1L).otherwise(0L))
        .as("bad_qty"),
      sum(when(!col("l_discount").between(0.0, 0.1), 1L).otherwise(0L))
        .as("bad_disc"))
    val lineitemRules = liStats.selectExpr(
      """stack(2,
        |  'range_l_quantity_1_50', 'lineitem', n, bad_qty,
        |  'range_l_discount_0_01', 'lineitem', n, bad_disc
        |) AS (rule, tbl, n_checked, n_violations)""".stripMargin)

    // ---- referential: orders.o_custkey ⊆ customer.c_custkey
    val custRef = o
      .join(c.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("ref_orders_customer").as("rule"), lit("orders").as("tbl"),
        col("n_checked"), col("n_violations"))

    // ---- referential the other way: every order has ≥1 lineitem
    val orderHasLines = o
      .join(li.select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("ref_orders_has_lineitem").as("rule"), lit("orders").as("tbl"),
        col("n_checked"), col("n_violations"))

    ordersRules.union(lineitemRules).union(custRef).union(orderHasLines)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("rule"))
  }

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_audit" -> (dqAudit _)
  )

  val oracle: Map[String, String] = Map(
    "q_dq_audit" ->
      """WITH rules AS (
        |  SELECT 'complete_o_custkey' AS rule, 'orders' AS tbl,
        |    (SELECT COUNT(*) FROM orders) AS n_checked,
        |    (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS n_violations
        |  UNION ALL
        |  SELECT 'unique_o_orderkey', 'orders',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
        |  UNION ALL
        |  SELECT 'accepted_o_orderstatus', 'orders',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P'))
        |  UNION ALL
        |  SELECT 'positive_o_totalprice', 'orders',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0.0)
        |  UNION ALL
        |  SELECT 'range_l_quantity_1_50', 'lineitem',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem WHERE l_quantity NOT BETWEEN 1.0 AND 50.0)
        |  UNION ALL
        |  SELECT 'range_l_discount_0_01', 'lineitem',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem WHERE l_discount NOT BETWEEN 0.0 AND 0.1)
        |  UNION ALL
        |  SELECT 'ref_orders_customer', 'orders',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'ref_orders_has_lineitem', 'orders',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)))
        |SELECT rule, tbl, CAST(n_checked AS BIGINT) AS n_checked,
        |  CAST(n_violations AS BIGINT) AS n_violations,
        |  n_violations = 0 AS pass
        |FROM rules ORDER BY rule""".stripMargin
  )
}
