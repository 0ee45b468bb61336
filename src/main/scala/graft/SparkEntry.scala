package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator catalog (one entry per operator
  * from SURVEY.md §2 plus the LLM-pipeline extensions); `oracleSql` holds
  * the DuckDB-equivalent SQL for every oracle-checkable entry. Entries
  * without oracle SQL (approximate sketches, binary outputs) get the
  * driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q3Shipping(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
    operators.Relational2.queries ++
    operators.Relational3.queries ++
    sources.SourcesSinks.queries ++
    sources.BucketV2.queries ++
    operators.Parity.queries ++
    operators.Pdf.queries ++
    operators.Fetch.queries ++
    operators.TextAnalysis.queries ++
    operators.Sampling.queries ++
    operators.Corpus.queries ++
    operators.Retrieval.queries ++
    operators.Curation.queries ++
    operators.Layout.queries ++
    operators.Dedup.queries ++
    operators.GraphOps.queries ++
    operators.DataQuality.queries ++
    operators.Similarity.queries ++
    operators.EventsOps.queries ++
    operators.Multimodal.queries ++
    streaming.Streaming.queries

  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
    operators.Relational2.oracle ++
    operators.Relational3.oracle ++
    sources.SourcesSinks.oracle ++
    sources.BucketV2.oracle ++
    operators.Parity.oracle ++
    operators.Pdf.oracle ++
    operators.Fetch.oracle ++
    operators.TextAnalysis.oracle ++
    operators.Sampling.oracle ++
    operators.Corpus.oracle ++
    operators.Retrieval.oracle ++
    operators.Curation.oracle ++
    operators.Layout.oracle ++
    operators.Dedup.oracle ++
    operators.GraphOps.oracle ++
    operators.DataQuality.oracle ++
    operators.Similarity.oracle ++
    operators.EventsOps.oracle ++
    operators.Multimodal.oracle ++
    streaming.Streaming.oracle
}
