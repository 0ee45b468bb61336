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
  * hash exchange on the stratum key; per-stratum O(k) heaps bound memory
  * ([[graft.plans.TopKPerGroupOp]] — no per-stratum sort anywhere in the
  * plan).
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
    * allocation; ties broken by the key itself.
    *
    * Selection runs through the custom bounded-memory operator
    * ([[graft.plans.TopKPerGroupOp]]: one hash exchange, O(k) heap per
    * stratum, spill-guarded) instead of a per-stratum window SORT — at
    * 100 TB a stratum is millions of rows and a full sort per stratum is
    * the scale bug. The op's contract is (score DOUBLE desc, tie LONG
    * asc), so the ranking hash is the NUMERIC value of the md5's first 13
    * hex chars (52 bits — double-exact), negated; the oracle orders by the
    * same 13-char prefix lexicographically, which for fixed-width hex is
    * the identical order, with the key as tie-breaker on both sides —
    * no cross-engine divergence at any scale. The post-selection
    * row_number ranks only the k·strata survivors (≤100 rows), not the
    * input. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val k = s.conf.get("spark.graft.sampling.stratumK", "20").toInt
    val base = orders(s, d)
      .withColumn("nscore",
        -expr("CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 13), 16, 10) AS DOUBLE)"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        col("nscore"))
    graft.plans.TopKPerGroupOp.topK(base, "o_orderpriority", "nscore", "o_orderkey", k)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("nscore").desc, col("o_orderkey"))))
      .select(col("o_orderpriority"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** Deterministic train/val/test split (13/2/1 sixteenths by the first
    * hex digit of md5(doc_id)): the assignment is a pure function of the
    * key, so a document keeps its split across runs, engines, and
    * incremental re-ingests — the property that prevents eval-set
    * contamination when the corpus grows. Per-row predicate, no shuffle
    * except the final summary agg; checksums pin exact membership. */
  def splitAssign(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("h", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn("split",
        when(col("h") <= "c", "train").when(col("h") <= "e", "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_checksum"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("split"))

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split_assign" -> (splitAssign _),
    "q_sample_bernoulli" -> (sampleBernoulli _),
    "q_sample_stratified" -> (sampleStratified _)
  )

  val oracle: Map[String, String] = Map(
    "q_split_assign" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'e' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, COUNT(*) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM a GROUP BY split ORDER BY split""".stripMargin,

    "q_sample_bernoulli" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY o_orderkey""".stripMargin,

    "q_sample_stratified" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13), o_orderkey) AS rk
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
        |FROM ranked WHERE rk <= 20
        |ORDER BY o_orderpriority, rk""".stripMargin
  )
}
