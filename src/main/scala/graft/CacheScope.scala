package graft

import org.apache.spark.sql.DataFrame

/** Per-query registry of persisted intermediates.
  *
  * Several operators cache an intermediate that feeds multiple branches of
  * the returned (lazy) plan — e.g. the MinHash signature table or the
  * n-gram prefix table. The cache must outlive the operator call (the
  * caller hasn't executed the plan yet), so a `try/finally unpersist`
  * inside the operator is impossible; but a bare `persist()` with no
  * release leaks blocks into a long-lived multi-tenant session until
  * someone calls `clearCache()` on the whole catalog (which also evicts
  * OTHER tenants' caches — too blunt for a shared session).
  *
  * Contract: operators route every `persist()` through [[track]]; the
  * consumer calls [[releaseAll]] once it has executed the result. Bench
  * and Verify do this between queries; a library user embedding a query
  * in a larger session does the same after their action. `releaseAll` is
  * scoped to exactly the frames the engine pinned — other caches in the
  * session are untouched.
  */
object CacheScope {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register an already-persisted frame for later release; returns it. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every tracked frame (non-blocking) and empty the registry. */
  def releaseAll(): Unit = {
    var d = tracked.poll()
    while (d != null) { d.unpersist(blocking = false); d = tracked.poll() }
  }
}
