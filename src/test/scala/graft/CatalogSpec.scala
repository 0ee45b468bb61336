package graft

/** Catalog-wide contract checks: every query in SparkEntry.queries must
  * execute at sf0.001 and be deterministic; every oracleSql key must
  * reference an existing query. */
class CatalogSpec extends SparkFunSuite {

  // pair-threshold queries may legitimately return zero rows at sf0.001
  private val mayBeEmpty = Set("q_dedup_minhash", "q_dedup_ngram",
    "q_embed_neardup", "q_join_anti")

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
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

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
