package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over the `embeddings`
  * table (64-dim float vectors).
  *
  * Three tiers, mirroring how you'd actually run this at 100 TB:
  *  1. brute-force cosine top-k with the (small) query set **broadcast** —
  *     the correctness baseline; the scan side streams, never shuffles;
  *  2. sign-LSH (random-hyperplane family, here fixed axis hyperplanes for
  *     determinism): bucket join prunes the candidate space, turning the
  *     n×m cross product into per-bucket joins — this is the scale path;
  *  3. threshold self-join for embedding near-dedup.
  *
  * The dot product is a per-row `zip_with`+`aggregate` fold in double
  * precision — sequential and deterministic, so results are oracle-exact
  * after rounding to 6 decimals (which absorbs any last-ulp divergence
  * between engines' summation codepaths).
  */
object Similarity {

  /** The cosine in DuckDB SQL (explicit per-dimension fold — identical
    * math/order to the codegen'd [[graft.functions.FloatVecDot]] path). */
  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |  * sqrt(list_sum(list_transform(range(1, 65), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))))""".stripMargin

  /** Brute-force cosine top-5 for 20 query vectors: broadcast the queries,
    * stream the candidate scan, rank per query. */
  def knnBrute(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = embeddings(s, d)
    // norms are computed once per vector BEFORE the pair join (sqrt(na) is
    // the same double either way, so results stay bit-identical) — each
    // pair then costs one dot product instead of three.
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(expr("vec_dot(embedding, embedding)")).as("qn"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      sqrt(expr("vec_dot(embedding, embedding)")).as("cn"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", round(expr("vec_dot(qv, cv)") / (col("qn") * col("cn")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("rn").cast("long").as("rn"), col("sim"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Sign-LSH bucketed ANN: 4-bit bucket from the sign of axis
    * hyperplanes (dims 1/17/33/49), candidates restricted to the query's
    * bucket — the IVF-style scale path (deterministic planes → oracle-able). */
  def knnLsh(s: SparkSession, d: String): DataFrame = {
    def bucketOf(v: String): Column = concat(
      when(expr(s"element_at($v, 1)") >= 0f, "1").otherwise("0"),
      when(expr(s"element_at($v, 17)") >= 0f, "1").otherwise("0"),
      when(expr(s"element_at($v, 33)") >= 0f, "1").otherwise("0"),
      when(expr(s"element_at($v, 49)") >= 0f, "1").otherwise("0"))
    graft.functions.VectorFunctions.register(s)
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        bucketOf("embedding").as("bucket"),
        sqrt(expr("vec_dot(embedding, embedding)")).as("qn"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      bucketOf("embedding").as("cbucket"),
      sqrt(expr("vec_dot(embedding, embedding)")).as("cn"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.join(broadcast(q), col("bucket") === col("cbucket") && col("qid") =!= col("cid"))
      .withColumn("sim", round(expr("vec_dot(qv, cv)") / (col("qn") * col("cn")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("bucket"), col("cid"),
        col("rn").cast("long").as("rn"), col("sim"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Embedding near-duplicate pairs: thresholded cosine self-join
    * (0.35 ≈ p99.8 of this corpus's pair similarity). */
  def embedNearDup(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = embeddings(s, d)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"),
      sqrt(expr("vec_dot(embedding, embedding)")).as("n1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"),
      sqrt(expr("vec_dot(embedding, embedding)")).as("n2"))
    a.join(b, col("v1") < col("v2"))
      .withColumn("sim", round(expr("vec_dot(e1, e2)") / (col("n1") * col("n2")), 6))
      .filter(col("sim") >= 0.35)
      .select(col("v1"), col("v2"), col("sim"))
      .orderBy(col("v1"), col("v2"))
  }

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_brute" -> (knnBrute _),
    "q_knn_lsh" -> (knnLsh _),
    "q_embed_neardup" -> (embedNearDup _)
  )

  val oracle: Map[String, String] = Map(
    "q_knn_brute" ->
      s"""WITH p AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    round(${cosSql("q.embedding", "c.embedding")}, 6) AS sim
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
        |r AS (SELECT qid, cid, sim,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM p)
        |SELECT qid, cid, CAST(rn AS BIGINT) AS rn, sim FROM r
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,

    "q_knn_lsh" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding,
        |    (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
        |     CASE WHEN embedding[17] >= 0 THEN '1' ELSE '0' END ||
        |     CASE WHEN embedding[33] >= 0 THEN '1' ELSE '0' END ||
        |     CASE WHEN embedding[49] >= 0 THEN '1' ELSE '0' END) AS bucket
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS qid, q.bucket AS bucket, c.vec_id AS cid,
        |    round(${cosSql("q.embedding", "c.embedding")}, 6) AS sim
        |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 50),
        |r AS (SELECT qid, bucket, cid, sim,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM p)
        |SELECT qid, bucket, cid, CAST(rn AS BIGINT) AS rn, sim FROM r
        |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,

    "q_embed_neardup" ->
      s"""SELECT a.vec_id AS v1, b.vec_id AS v2,
        |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= 0.35
        |ORDER BY v1, v2""".stripMargin
  )
}
