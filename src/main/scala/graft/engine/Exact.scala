package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic numeric aggregation helpers.
  *
  * Spark sums doubles in partition-completion order, which is
  * nondeterministic run-to-run and never matches a single-threaded oracle
  * bit-for-bit. Casting each element to DECIMAL before SUM makes the
  * aggregation exact and order-independent (integer arithmetic underneath),
  * so Spark and the DuckDB oracle agree bitwise; the final cast back to
  * DOUBLE is deterministic on both sides. This also holds on a
  * 1000-executor cluster — decimal sums are associative/commutative, so
  * partial (map-side) aggregation stays enabled.
  */
object Exact {
  /** SUM(x) computed exactly via decimal, returned as double. */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** AVG(x) = exact decimal sum cast to double, then double-divided by
    * count — the division must happen in double on both engines, or each
    * rounds the decimal quotient at a different scale.
    */
  def davg(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double") / count(c)
}
