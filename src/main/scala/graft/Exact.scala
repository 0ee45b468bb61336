package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that make floating-point aggregates *bit-identical* between
  * Spark and the DuckDB oracle.
  *
  * Summing doubles is order-dependent, and Spark's partial/final aggregation
  * order differs run to run — so every money/quantity aggregate is computed
  * in exact decimal arithmetic and only cast back to double at the very end.
  * Both engines convert the same exact decimal to the same nearest double,
  * so hash comparison is stable. The same pattern is what you'd want at
  * 100 TB anyway: decimal sums don't lose precision across 10^9 rows.
  */
object Exact {
  /** Cast to decimal(p,s) — exact for the synthetic money/qty columns. */
  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** Cast to decimal(18,2). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum surfaced as double (deterministic both engines). */
  def dsum2(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact average: decimal sum cast to double, divided by count.
    * Both engines do the identical double division → identical bits. */
  def davg2(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)

  /** revenue term l_extendedprice * (1 - l_discount) in exact decimals. */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (lit(java.math.BigDecimal.ONE).cast(DecimalType(18, 2)) - dec2(discount))
}
