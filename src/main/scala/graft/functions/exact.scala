package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-exact, order-independent aggregates over fixed-point-valued
  * double columns (money, quantities, 2-dp measurements).
  *
  * `sum(double)` is order-dependent in IEEE arithmetic, so a Spark
  * sum and a DuckDB-oracle sum of the same column can differ in the
  * last ulp and fail a hash compare — and on a 1000-executor cluster
  * the partial-aggregation order is nondeterministic run to run.
  * Scaling each addend to an integer first makes the sum exact and
  * associative: same answer on any partitioning, any engine.
  *
  * The matching oracle-SQL fragments are in
  * [[graft.OracleDsl]] — both sides MUST keep the same expression
  * shape so per-row IEEE results are identical.
  */
object exact {

  /** THE per-row scaled-integer expression every exact aggregate is
    * built from — one definition so consumers (xsum, the incremental
    * rollup state, streaming folds) can never drift apart. */
  def scaled(c: Column, digits: Int): Column =
    round(c * math.pow(10, digits)).cast("long")

  /** Exact sum of a column whose values carry at most `digits`
    * decimal places: sum(round(c*10^d)::long)/10^d. */
  def xsum(c: Column, digits: Int): Column =
    sum(scaled(c, digits)).cast("double") / math.pow(10, digits)

  /** Exact average with the same scaled-integer trick; division by
    * the NON-NULL count (standard AVG semantics — the sum already
    * skips nulls, so the denominator must too) happens once, after
    * the exact sum. */
  def xavg(c: Column, digits: Int): Column =
    xsum(c, digits) / count(c)
}
