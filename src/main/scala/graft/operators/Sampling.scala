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
    val k = graft.GraftConf.int(s, "spark.graft.sampling.stratumK", 20)
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

  /** LEAKAGE-SAFE split: [[splitAssign]] hashes each doc independently —
    * but near-duplicate docs then land in DIFFERENT splits, and a test
    * doc with a train-set near-twin is evaluation leakage (the model has
    * effectively seen it). The repair is GROUP-ATOMIC assignment: hash
    * the near-dup CLUSTER id (singletons hash their own id, which is
    * also what a cluster id is — the member minimum — so the two cases
    * are one formula), and a cluster can't span splits by construction.
    * The `n_moved_vs_naive` column counts the docs the repair actually
    * relocated relative to the per-doc hash — the measured size of the
    * leak channel that was closed.
    *
    * Scale shape: the cluster table is pair-derived (≪ corpus) and LEFT
    * joins onto the doc list by key; assignment is a per-row md5; the
    * summary is one partial-agg over 3 groups. With
    * `spark.graft.dedup.shareClusters=true` the cluster pipeline is
    * reused from the published snapshot (producer-pays, see
    * [[Dedup.dedupClusters]]); otherwise it's recomputed here. */
  def splitLeakageSafe(s: SparkSession, d: String): DataFrame = {
    def bucket(c: org.apache.spark.sql.Column) =
      substring(md5(concat(lit("split:"), c.cast("string"))), 1, 1)
    def toSplit(h: org.apache.spark.sql.Column) =
      when(h <= "c", "train").when(h <= "e", "val").otherwise("test")
    val clusters = Dedup.sharedClusters(s, d)
      .getOrElse(Dedup.dedupClusters(s, d))
      .select(col("doc_id"), col("cluster_id"))
    documents(s, d).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", toSplit(bucket(col("group_id"))))
      .withColumn("naive_split", toSplit(bucket(col("doc_id"))))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("group_id")).as("n_groups"),
        sum(col("doc_id")).as("id_checksum"),
        sum(when(col("split") =!= col("naive_split"), 1L).otherwise(0L))
          .as("n_moved_vs_naive"))
      .orderBy(col("split"))
  }

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split_leakage_safe" -> (splitLeakageSafe _),
    "q_split_assign" -> (splitAssign _),
    "q_sample_bernoulli" -> (sampleBernoulli _),
    "q_sample_stratified" -> (sampleStratified _)
  )

  val oracle: Map[String, String] = Map(
    // the cluster derivation is the q_dedup_clusters oracle verbatim;
    // split assignment then hashes the group id
    "q_split_leakage_safe" ->
      """WITH RECURSIVE sig AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 8), h ->
        |      list_min(list_transform(list_distinct(string_split(text, ' ')),
        |        t -> md5(t || '#' || CAST(h AS VARCHAR))))) AS s
        |  FROM documents),
        |bands AS (
        |  SELECT doc_id, b,
        |    md5(s[4*b+1] || s[4*b+2] || s[4*b+3] || s[4*b+4]) AS bucket
        |  FROM sig, range(0, 2) r(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
        |  FROM bands a JOIN bands c
        |    ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
        |p AS (
        |  SELECT d1, d2
        |  FROM cand JOIN sig x ON d1 = x.doc_id JOIN sig y ON d2 = y.doc_id
        |  WHERE list_sum(list_transform(range(0, 8),
        |    i -> CASE WHEN x.s[i+1] = y.s[i+1] THEN 1 ELSE 0 END)) >= 6),
        |edges AS (
        |  SELECT d1 AS src, d2 AS dst FROM p
        |  UNION ALL SELECT d2, d1 FROM p),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |reach(node, lbl) AS (
        |  SELECT node, node AS lbl FROM nodes
        |  UNION
        |  SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        |cc AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
        |g AS (
        |  SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS group_id
        |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.node),
        |a AS (
        |  SELECT doc_id, group_id,
        |    CASE WHEN substr(md5('split:' || CAST(group_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
        |         WHEN substr(md5('split:' || CAST(group_id AS VARCHAR)), 1, 1) <= 'e' THEN 'val'
        |         ELSE 'test' END AS split,
        |    CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
        |         WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'e' THEN 'val'
        |         ELSE 'test' END AS naive_split
        |  FROM g)
        |SELECT split, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT group_id) AS n_groups,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
        |  CAST(SUM(CASE WHEN split <> naive_split THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_moved_vs_naive
        |FROM a GROUP BY split ORDER BY split""".stripMargin,

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
