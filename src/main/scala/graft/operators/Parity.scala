package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity pipeline (SURVEY.md §2 O5–O24): the document-ETL
  * semantics of ofekshmu/project-map-reduce re-expressed Spark-first.
  *
  * The reference fans one task per input line over SQS to workers that
  * dispatch on an operation string, convert a PDF, wrap failures as
  * in-band `Error:` values, and gather exactly-N tab-separated result rows
  * (Manager.java:279-311, Workers.java:111-221). Here the whole pipeline
  * is ONE declarative plan over the `documents` table:
  *
  *  - wire format (`appId TAB op TAB ref`, Manager.java:281) is built and
  *    re-tokenized with `concat_ws`/`split` — projection operators O8/O9;
  *  - dispatch-on-operation (Workers.java:131/150/162) is a `when` chain
  *    — O11, whole-stage-codegen'd, no UDF;
  *  - the three transforms are deterministic string/hash renderings of
  *    "convert page 1" (Workers.java:131-184) — O12–O14;
  *  - errors stay rows (`Error: File is Encrypted`, `Error: Unsupported
  *    operation:` — Workers.java:186-221) — O15/O16; unlike the
  *    at-least-once reference (SURVEY.md §A Q4) a Spark task retry cannot
  *    duplicate results: the plan is deterministic, exactly-once per row;
  *  - result rows use the reference's `op: TAB in TAB out` layout
  *    (Workers.java:124) — O17;
  *  - gather/count barriers (Manager.java:286-311) are aggregations;
  *  - the HTML report (LocalApp.java:302-343) is a projection.
  *
  * Scale: no driver-side loops, no collect; fan-out is partitioning
  * (the exchange IS the SQS queue analog); the correlation filter pushes
  * down to the parquet scan. At 100 TB each stage is a narrow map over
  * whatever partitioning the scan provides — no shuffle until the gather
  * aggregation, which is a partial-agg count.
  */
/** Typed task record (SURVEY.md §1.3: the engine makes the reference's
  * implicit positional message layouts explicit, schema-checked types). */
final case class TaskSpec(doc_id: Long, app_id: String, operation: String,
  input_ref: String)

/** Typed result record — error-as-value: `output` carries either the
  * artifact ref or the in-band `Error: …` string, `is_error` splits them. */
final case class TaskResult(doc_id: Long, app_id: String, operation: String,
  input_ref: String, output: String, is_error: Boolean, result_row: String)

object Parity {

  private val TAB = "\t"

  /** Typed view of the task stream (Dataset[TaskSpec]). */
  def taskSpecs(s: SparkSession, d: String): org.apache.spark.sql.Dataset[TaskSpec] = {
    import s.implicits._
    pipeline(s, d)
      .select(col("doc_id"), col("app_id"), col("operation"), col("input_ref"))
      .as[TaskSpec]
  }

  /** Typed view of the result stream (Dataset[TaskResult]) — the
    * `Dataset[TaskSpec] → Dataset[TaskResult]` pipeline stage contract. */
  def taskResults(s: SparkSession, d: String): org.apache.spark.sql.Dataset[TaskResult] = {
    import s.implicits._
    pipeline(s, d).as[TaskResult]
  }

  /** Stage 1 (LocalApp analog): documents → task wire messages.
    * appId multiplexes 7 concurrent "clients" (Manager.java:22 multi-tenant
    * intake); operation cycles the three reference ops plus an unknown one
    * to exercise the error path. */
  def taskMessages(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      col("source"),
      concat_ws(TAB,
        concat(lit("app"), col("doc_id") % 7),
        element_at(
          array(lit("ToText"), lit("ToHTML"), lit("ToImage"), lit("ToPdfA")),
          (col("doc_id") % 4 + 1).cast("int")),
        concat(lit("doc://"), col("source"), lit("/"), col("doc_id"))).as("task_msg"),
      col("text"))

  /** Stages 2-4 (Workers analog): tokenize → dispatch → transform →
    * error-as-value → result row. */
  def pipeline(s: SparkSession, d: String): DataFrame = {
    val toks = taskMessages(s, d)
      .withColumn("app_id", split(col("task_msg"), TAB).getItem(0))
      .withColumn("operation", split(col("task_msg"), TAB).getItem(1))
      .withColumn("input_ref", split(col("task_msg"), TAB).getItem(2))
    // "encrypted document" predicate (Workers.java:130): src0 plays the
    // encrypted corpus; record-level errors stay rows, they never kill tasks.
    val output =
      when(col("source") === "src0", lit("Error: File is Encrypted"))
        .when(col("operation") === "ToText",
          concat(lit("s3://graft-out/text/"), col("doc_id"), lit(".txt#"),
            md5(substring(col("text"), 1, 200))))
        .when(col("operation") === "ToHTML",
          concat(lit("s3://graft-out/html/"), col("doc_id"), lit(".html#"),
            md5(concat(lit("<html><body>"), substring(col("text"), 1, 200),
              lit("</body></html>")))))
        .when(col("operation") === "ToImage",
          concat(lit("s3://graft-out/png/"), col("doc_id"), lit(".png#"),
            md5(concat(lit("png:page1:"), col("text")))))
        .otherwise(concat(lit("Error: Unsupported operation: "), col("operation")))
    toks
      .withColumn("output", output)
      .withColumn("is_error", col("output").startsWith("Error:"))
      .withColumn("result_row",
        concat_ws(TAB, concat(col("operation"), lit(":")), col("input_ref"), col("output")))
      .select(col("doc_id"), col("app_id"), col("operation"), col("input_ref"),
        col("output"), col("is_error"), col("result_row"))
  }

  /** Full pipeline dump, ordered (engine policy: total order — the
    * reference's gather is arrival-ordered, SURVEY.md §A Q3). */
  def parityPipeline(s: SparkSession, d: String): DataFrame =
    pipeline(s, d).orderBy(col("doc_id"))

  /** O10: correlation-id predicate — one client's slice of the shared
    * result stream (LocalApp.java:264-288). */
  def parityCorrelation(s: SparkSession, d: String): DataFrame =
    pipeline(s, d)
      .filter(col("app_id") === "app3")
      .select(col("doc_id"), col("operation"), col("result_row"))
      .orderBy(col("doc_id"))

  /** O18/O19: the count-down gather barrier as an aggregation — exactly-N
    * accounting per client, plus the error taxonomy split. */
  def parityGather(s: SparkSession, d: String): DataFrame =
    pipeline(s, d)
      .groupBy(col("app_id"))
      .agg(
        count(lit(1)).as("n_results"),
        sum(when(col("is_error"), 1L).otherwise(0L)).as("n_errors"),
        sum(when(!col("is_error"), 1L).otherwise(0L)).as("n_ok"),
        countDistinct(col("operation")).as("n_ops"))
      .orderBy(col("app_id"))

  /** O24: HTML report sink — each result line wrapped for the report
    * (LocalApp.java:302-343 wraps lines in <br>). */
  def parityReport(s: SparkSession, d: String): DataFrame =
    pipeline(s, d)
      .select(col("doc_id"),
        concat(lit("<br>"), col("result_row")).as("html_line"))
      .orderBy(col("doc_id"))

  /** O24 complete form: the whole report as ONE HTML document per client —
    * banner + <br>-joined result lines in doc order (LocalApp.java:302-343
    * renders exactly this shape). The collect_list/sort/join runs per
    * app_id group, so at scale each client's report builds independently. */
  def parityReportDoc(s: SparkSession, d: String): DataFrame =
    pipeline(s, d)
      .groupBy(col("app_id"))
      .agg(expr(
        """concat('<html><body><h1>Results</h1>',
          |  array_join(transform(array_sort(collect_list(struct(doc_id, result_row))),
          |    x -> concat('<br>', x.result_row)), ''),
          |  '</body></html>')""".stripMargin).as("report_html"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("app_id"))

  /** §2.3 job-message round trip: build the 6-token JobSpec wire format
    * (the reference's producer sends 4 tokens while its consumer reads 6 —
    * SURVEY.md §A Q1; the engine uses the consumer's 6-field schema,
    * schema-checked) and parse it back with typed casts. */
  def parityJobspec(s: SparkSession, d: String): DataFrame = {
    val jobs = pipeline(s, d)
      .groupBy(col("app_id")).agg(count(lit(1)).as("n"))
      .select(concat_ws(" ",
        col("app_id"), lit("false"), col("n"),
        concat(lit("s3://graft-jobs/"), col("app_id"), lit("/input.txt")),
        lit("graft-bucket"),
        concat(col("app_id"), lit("/results.txt"))).as("job_msg"))
    val p = split(col("job_msg"), " ")
    jobs.select(
      col("job_msg"),
      p.getItem(0).as("app_id"),
      p.getItem(1).cast("boolean").as("terminate"),
      p.getItem(2).cast("long").as("n_tasks"),
      p.getItem(3).as("file_url"),
      p.getItem(4).as("bucket"),
      p.getItem(5).as("key"))
      .orderBy(col("app_id"))
  }

  /** O8/O9 typed variant: schema-checked wire-message parse via `from_csv`
    * (the reference tokenizes positionally and trusts the layout,
    * Workers.java:236-239; the engine's parse is schema-typed, so a
    * malformed message surfaces as nulls instead of an
    * ArrayIndexOutOfBounds-killed worker). */
  def parityTaskParse(s: SparkSession, d: String): DataFrame =
    taskMessages(s, d)
      .select(col("doc_id"),
        from_csv(col("task_msg"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "app_id STRING, operation STRING, input_ref STRING"),
          Map("sep" -> TAB)).as("t"))
      .select(col("doc_id"), col("t.app_id").as("app_id"),
        col("t.operation").as("operation"), col("t.input_ref").as("input_ref"),
        (col("t.app_id").isNotNull && col("t.operation").isNotNull &&
          col("t.input_ref").isNotNull).as("well_formed"))
      .orderBy(col("doc_id"))

  /** O20/Q6: the reference's worker-sizing heuristic — `workers =
    * numLines / n` (n = lines-per-worker, LocalApp.java:117-126, integer
    * division) clamped to the 19-instance free-tier cap (also
    * Manager.java:108-110). In the engine this is what partition-count
    * selection replaces; reproduced here as the parity artifact with n=5. */
  def paritySizing(s: SparkSession, d: String): DataFrame =
    pipeline(s, d)
      .groupBy(col("app_id"))
      .agg(count(lit(1)).as("n_lines"))
      .select(col("app_id"), col("n_lines"),
        least(expr("n_lines DIV 5"), lit(19L)).as("workers"))
      .orderBy(col("app_id"))

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_parity_sizing" -> (paritySizing _),
    "q_parity_pipeline" -> (parityPipeline _),
    "q_parity_correlation" -> (parityCorrelation _),
    "q_parity_gather" -> (parityGather _),
    "q_parity_report" -> (parityReport _),
    "q_parity_report_doc" -> (parityReportDoc _),
    "q_parity_jobspec" -> (parityJobspec _),
    "q_parity_taskparse" -> (parityTaskParse _)
  )

  /** Shared oracle CTE: the same pipeline in DuckDB SQL. chr(9) = TAB. */
  private val pipelineCte =
    """WITH toks AS (
      |  SELECT doc_id, source, text,
      |    'app' || CAST(doc_id % 7 AS VARCHAR) AS app_id,
      |    ['ToText','ToHTML','ToImage','ToPdfA'][CAST(doc_id % 4 AS INT) + 1] AS operation,
      |    'doc://' || source || '/' || CAST(doc_id AS VARCHAR) AS input_ref
      |  FROM documents),
      |piped AS (
      |  SELECT doc_id, app_id, operation, input_ref,
      |    CASE
      |      WHEN source = 'src0' THEN 'Error: File is Encrypted'
      |      WHEN operation = 'ToText' THEN
      |        's3://graft-out/text/' || CAST(doc_id AS VARCHAR) || '.txt#' || md5(substring(text, 1, 200))
      |      WHEN operation = 'ToHTML' THEN
      |        's3://graft-out/html/' || CAST(doc_id AS VARCHAR) || '.html#' || md5('<html><body>' || substring(text, 1, 200) || '</body></html>')
      |      WHEN operation = 'ToImage' THEN
      |        's3://graft-out/png/' || CAST(doc_id AS VARCHAR) || '.png#' || md5('png:page1:' || text)
      |      ELSE 'Error: Unsupported operation: ' || operation
      |    END AS output
      |  FROM toks),
      |results AS (
      |  SELECT doc_id, app_id, operation, input_ref, output,
      |    (output LIKE 'Error:%') AS is_error,
      |    operation || ':' || chr(9) || input_ref || chr(9) || output AS result_row
      |  FROM piped)
      |""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_parity_sizing" -> (pipelineCte +
      """SELECT app_id, COUNT(*) AS n_lines,
        |  least(COUNT(*) // 5, 19) AS workers
        |FROM results GROUP BY app_id ORDER BY app_id""".stripMargin),

    "q_parity_pipeline" -> (pipelineCte +
      "SELECT doc_id, app_id, operation, input_ref, output, is_error, result_row FROM results ORDER BY doc_id"),

    "q_parity_correlation" -> (pipelineCte +
      "SELECT doc_id, operation, result_row FROM results WHERE app_id = 'app3' ORDER BY doc_id"),

    "q_parity_gather" -> (pipelineCte +
      """SELECT app_id,
        |  COUNT(*) AS n_results,
        |  CAST(SUM(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        |  CAST(SUM(CASE WHEN is_error THEN 0 ELSE 1 END) AS BIGINT) AS n_ok,
        |  COUNT(DISTINCT operation) AS n_ops
        |FROM results GROUP BY app_id ORDER BY app_id""".stripMargin),

    "q_parity_taskparse" -> (pipelineCte +
      """SELECT doc_id, app_id, operation, input_ref, TRUE AS well_formed
        |FROM results ORDER BY doc_id""".stripMargin),

    "q_parity_report" -> (pipelineCte +
      "SELECT doc_id, '<br>' || result_row AS html_line FROM results ORDER BY doc_id"),

    "q_parity_report_doc" -> (pipelineCte +
      """SELECT app_id,
        |  '<html><body><h1>Results</h1>' ||
        |    string_agg('<br>' || result_row, '' ORDER BY doc_id) ||
        |    '</body></html>' AS report_html,
        |  COUNT(*) AS n_lines
        |FROM results GROUP BY app_id ORDER BY app_id""".stripMargin),

    "q_parity_jobspec" -> (pipelineCte +
      """, jobs AS (
        |  SELECT app_id || ' false ' || CAST(COUNT(*) AS VARCHAR)
        |    || ' s3://graft-jobs/' || app_id || '/input.txt'
        |    || ' graft-bucket ' || app_id || '/results.txt' AS job_msg
        |  FROM results GROUP BY app_id)
        |SELECT job_msg,
        |  string_split(job_msg, ' ')[1] AS app_id,
        |  CAST(string_split(job_msg, ' ')[2] AS BOOLEAN) AS terminate,
        |  CAST(string_split(job_msg, ' ')[3] AS BIGINT) AS n_tasks,
        |  string_split(job_msg, ' ')[4] AS file_url,
        |  string_split(job_msg, ' ')[5] AS bucket,
        |  string_split(job_msg, ' ')[6] AS key
        |FROM jobs ORDER BY app_id""".stripMargin)
  )
}
