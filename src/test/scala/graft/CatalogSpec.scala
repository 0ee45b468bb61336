package graft

/** Catalog-wide contract checks: every query in SparkEntry.queries must
  * execute at sf0.001 and be deterministic; every oracleSql key must
  * reference an existing query. */
class CatalogSpec extends SparkFunSuite {

  // pair-threshold queries may legitimately return zero rows at sf0.001
  private val mayBeEmpty = Set("q_dedup_minhash", "q_dedup_minhash_bucketed",
    "q_dedup_ngram", "q_dedup_ngram_bucketed", "q_embed_neardup")

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("no module silently overwrites another's query name") {
    val moduleSizes = Seq(
      operators.Relational.queries.size, operators.Relational2.queries.size,
      operators.Relational3.queries.size, sources.SourcesSinks.queries.size,
      operators.Parity.queries.size, operators.Pdf.queries.size,
      operators.Fetch.queries.size, operators.TextAnalysis.queries.size,
      operators.Sampling.queries.size, operators.Corpus.queries.size,
      operators.Retrieval.queries.size,
      operators.Curation.queries.size, operators.Layout.queries.size,
      operators.Dedup.queries.size, operators.GraphOps.queries.size,
      operators.DataQuality.queries.size, operators.Similarity.queries.size,
      operators.EventsOps.queries.size, operators.Multimodal.queries.size,
      streaming.Streaming.queries.size, sources.BucketV2.queries.size)
    assert(moduleSizes.sum === SparkEntry.queries.size,
      "duplicate query name across modules (map merge dropped one)")
  }

  test("typed pipeline stage: Dataset[TaskSpec] -> Dataset[TaskResult]") {
    val specs = operators.Parity.taskSpecs(spark, sf)
    val results = operators.Parity.taskResults(spark, sf)
    assert(specs.count() === results.count())
    assert(results.filter(_.is_error).count() > 0)
  }

  test("no query emits a raw array/map/struct column (driver hasher limit)") {
    // The verification driver hashes results via a pandas sort over all
    // output columns; an ArrayType cell arrives as an ndarray and pandas
    // raises `TypeError: unhashable type` (round-3 q_embed_quantize).
    // Catalog rule: complex values leave the engine serialized
    // (array_join/to_json) or exploded to rows.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"queries emitting driver-unhashable columns:\n${offenders.mkString("\n")}")
  }

  test("every catalog query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        if (n == 0 && !mayBeEmpty(name)) Some(s"$name: 0 rows") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("persisting queries leave no cache behind after CacheScope release") {
    // every operator that persists an intermediate must route it through
    // CacheScope.track, so a long-lived multi-tenant session can release
    // exactly the engine's blocks after each action (clearCache would
    // evict other tenants' caches too)
    val persisting = Seq("q_dedup_minhash", "q_dedup_incremental",
      "q_dedup_clusters", "q_dedup_ngram", "q_knn_ivf",
      "q_dedup_representative", "q_knn_ivfpq")
    spark.catalog.clearCache()
    for (name <- persisting) {
      SparkEntry.queries(name)(spark, sf).count()
      CacheScope.releaseAll()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left cached plans behind after CacheScope.releaseAll()")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
