package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. `TABLESAMPLE` /
  * `df.sample` draw from a seeded RNG whose stream depends on partition
  * layout — re-partition the input and the sample changes, and no external
  * oracle can reproduce it. A 100 TB curation pipeline wants the opposite:
  * membership decided by a HASH of the row key, so the sample is stable
  * across runs, engines, partitionings, and incremental re-ingests (a doc
  * that was in yesterday's 10% sample is in today's too).
  *
  * Scale shape: Bernoulli sampling is a pure per-row predicate — pushed to
  * the scan, no shuffle, no driver coordination. Stratified top-n needs one
  * hash exchange on the stratum key; per-stratum heaps bound memory (this
  * uses rank-within-window, whose sort AQE sizes per stratum — for huge
  * strata swap in [[graft.plans.TopKPerGroupOp]], same contract).
  */
object Sampling {

  /** ~12.5% Bernoulli sample of orders: keep rows whose md5(key) starts
    * with hex 0 or 1 (2/16 of the uniform hash space). Engine-portable
    * (md5 is md5 everywhere) and partition-invariant, unlike RNG samples. */
  def sampleBernoulli(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** Stratified sample: exactly 20 orders per priority stratum, chosen by
    * hash order (md5 of the key) — deterministic proportional-ish
    * allocation without a global sort; ties broken by the key itself. */
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("hk", md5(col("o_orderkey").cast("string")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("hk"), col("o_orderkey"))))
      .filter(col("rk") <= 20)
      .select(col("o_orderpriority"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_bernoulli" -> (sampleBernoulli _),
    "q_sample_stratified" -> (sampleStratified _)
  )

  val oracle: Map[String, String] = Map(
    "q_sample_bernoulli" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY o_orderkey""".stripMargin,

    "q_sample_stratified" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
        |FROM ranked WHERE rk <= 20
        |ORDER BY o_orderpriority, rk""".stripMargin
  )
}
