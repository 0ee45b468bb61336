package graft.operators

/** Helpers for DERIVED oracle SQL — shard/panel faces build their
  * oracle by injecting one predicate into the base face's SQL. A plain
  * `.replace` fails silently twice over: a reformat of the base SQL
  * makes it a no-op (the shard face then replays the FULL oracle and
  * the gate fails later, at driver runtime), and a constant edited on
  * the engine side but not in the replacement literal diverges the two
  * quietly. [[mustReplace]] closes the first hole (no-op throws at
  * object init, so any spec touching the oracle map catches it);
  * interpolating the engine constant into the replacement string closes
  * the second. */
private[operators] object OracleSql {
  /** `sql.replace(from, to)` that THROWS when nothing was replaced. */
  def mustReplace(sql: String, from: String, to: String): String = {
    val out = sql.replace(from, to)
    require(out != sql,
      s"derived-oracle no-op: pattern not found in base SQL: $from")
    out
  }
}
