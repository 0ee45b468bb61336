package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite for a training-data pipeline: exact, normalized
  * (bag-of-words), MinHash+LSH, character-n-gram Jaccard, and SimHash.
  *
  * Scale design (the whole point of these ops is the 100 TB case):
  *  - signatures (MinHash, SimHash, fingerprints) are computed **per-row
  *    with higher-order array functions** — a narrow map at scan speed, no
  *    explode/shuffle for signature construction;
  *  - the only shuffles are the LSH band-bucket exchange (small keys) and
  *    the candidate-pair join — which is the LSH point: candidates, not
  *    all O(n²) pairs, hit the join;
  *  - exact/normalized dedup is a hash aggregation on a 128-bit key —
  *    partial-agg friendly, skew-safe (md5 keys are uniform).
  */
object Dedup {

  /** Exact dedup: group by content hash (md5 — uniform shuffle keys). */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(col("text")).as("content_key"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
      .orderBy(col("content_key"))

  /** Normalized dedup: bag-of-words canonical key — catches reorderings
    * and repetition-only differences that exact hashing misses. */
  def dedupNormalized(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(expr("array_join(array_sort(array_distinct(split(text, ' '))), ' ')"))
        .as("bow_key"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("bow_key"))

  /** MinHash signature: 8 hash functions h = md5(token || '#' || h) over
    * the distinct-token set; computed per-row, no explode. */
  private val sigExpr =
    expr("""transform(sequence(0, 7), h ->
      array_min(transform(array_distinct(split(text, ' ')),
        t -> md5(concat(t, '#', CAST(h AS STRING))))))""".stripMargin)

  /** MinHash + LSH banding (2 bands x 4 rows): candidate pairs from
    * band-bucket collisions, then estimated Jaccard >= 0.75 post-filter.
    * This is the scale path for near-dedup: the n² pair space never
    * materializes, only same-bucket candidates do. */
  def dedupMinhash(s: SparkSession, d: String): DataFrame = {
    val sigs = documents(s, d).select(col("doc_id"), sigExpr.as("sig"))
    val bands = sigs.select(col("doc_id"),
        posexplode(expr("""transform(sequence(0, 1), b ->
          md5(concat(element_at(sig, 4*b+1), element_at(sig, 4*b+2),
                     element_at(sig, 4*b+3), element_at(sig, 4*b+4))))""")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val s1 = sigs.select(col("doc_id").as("d1"), col("sig").as("sig1"))
    val s2 = sigs.select(col("doc_id").as("d2"), col("sig").as("sig2"))
    pairs.join(s1, "d1").join(s2, "d2")
      .withColumn("matches",
        expr("""aggregate(zip_with(sig1, sig2, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
                0, (acc, v) -> acc + v)"""))
      .filter(col("matches") >= 6)
      .select(col("d1"), col("d2"), col("matches").cast("long").as("matches"),
        (col("matches") / 8.0).as("est_jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Character-3-gram Jaccard within each source partition: exact set
    * similarity over shingles, blocked by `source` so the pair space is
    * per-block (the blocking key would be the LSH bucket at scale). */
  def dedupNgram(s: SparkSession, d: String): DataFrame = {
    val sh = documents(s, d).select(col("doc_id"), col("source"),
      explode(expr(
        "array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)))"))
        .as("shingle"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.source") === col("b.source") && col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("doc_id").as("d1"), col("n_shingles").as("n1")), "d1")
      .join(sz.select(col("doc_id").as("d2"), col("n_shingles").as("n2")), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= 0.6)
      .select(col("d1"), col("d2"), col("inter"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** 32-bit SimHash per document, computed entirely per-row (nested
    * higher-order aggregate over the token set — no explode, no shuffle):
    * bit b = sign of the sum over tokens of ±1 by md5-bit b. */
  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        expr("""array_join(
            transform(sequence(0, 31), b ->
              CASE WHEN aggregate(
                  array_distinct(split(text, ' ')),
                  0,
                  (acc, t) -> acc + (CASE WHEN (shiftright(
                      locate(substring(md5(t), CAST(b DIV 4 AS INT) + 1, 1), '0123456789abcdef') - 1,
                      3 - CAST(b % 4 AS INT)) & 1) = 1 THEN 1 ELSE -1 END)
                ) > 0 THEN '1' ELSE '0' END),
            '')""").as("simhash"))
      .orderBy(col("doc_id"))

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (dedupExact _),
    "q_dedup_normalized" -> (dedupNormalized _),
    "q_dedup_minhash" -> (dedupMinhash _),
    "q_dedup_ngram" -> (dedupNgram _),
    "q_dedup_simhash" -> (dedupSimhash _)
  )

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_key, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc
        |FROM documents GROUP BY 1 ORDER BY content_key""".stripMargin,

    "q_dedup_normalized" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_key,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc, MAX(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY bow_key""".stripMargin,

    "q_dedup_minhash" ->
      """WITH sig AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 8), h ->
        |      list_min(list_transform(list_distinct(string_split(text, ' ')),
        |        t -> md5(t || '#' || CAST(h AS VARCHAR))))) AS s
        |  FROM documents),
        |bands AS (
        |  SELECT doc_id, b,
        |    md5(s[4*b+1] || s[4*b+2] || s[4*b+3] || s[4*b+4]) AS bucket
        |  FROM sig, range(0, 2) r(b)),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
        |  FROM bands a JOIN bands c
        |    ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
        |est AS (
        |  SELECT d1, d2,
        |    list_sum(list_transform(range(0, 8),
        |      i -> CASE WHEN x.s[i+1] = y.s[i+1] THEN 1 ELSE 0 END)) AS m
        |  FROM pairs JOIN sig x ON d1 = x.doc_id JOIN sig y ON d2 = y.doc_id)
        |SELECT d1, d2, CAST(m AS BIGINT) AS matches, m / 8.0 AS est_jaccard
        |FROM est WHERE m >= 6 ORDER BY d1, d2""".stripMargin,

    "q_dedup_ngram" ->
      """WITH sh AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(list_transform(range(1, len(text) - 1),
        |      i -> substr(text, i, 3)))) AS shingle
        |  FROM documents),
        |sz AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |  FROM sh a JOIN sh b
        |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, inter,
        |  CAST(inter AS DOUBLE) / (x.n_shingles + y.n_shingles - inter) AS jaccard
        |FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
        |WHERE CAST(inter AS DOUBLE) / (x.n_shingles + y.n_shingles - inter) >= 0.6
        |ORDER BY d1, d2""".stripMargin,

    "q_dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN ((strpos('0123456789abcdef', substr(md5(t), CAST(b // 4 AS INT) + 1, 1)) - 1)
        |              >> CAST(3 - b % 4 AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS sm
        |  FROM tok, range(0, 32) r(b) GROUP BY doc_id, b)
        |SELECT doc_id,
        |  string_agg(CASE WHEN sm > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
