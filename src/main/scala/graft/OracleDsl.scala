package graft

/** DuckDB-oracle SQL fragments mirroring [[graft.functions.exact]].
  *
  * DuckDB quirks handled here:
  *  - `sum(BIGINT)` returns HUGEINT → always cast back to BIGINT;
  *  - `round(decimal_literal, n)` returns DECIMAL → keep inputs
  *    double-typed (`1e2`-style factors) so results stay DOUBLE and
  *    match Spark's schema.
  */
object OracleDsl {
  /** Exact scaled-integer sum — same shape as exact.xsum. */
  def oSum(e: String, digits: Int): String =
    s"cast(sum(cast(round(($e)*1e$digits) as bigint)) as double)/1e$digits"

  /** Exact average — same shape as exact.xavg (denominator = count
    * of NON-NULL values, standard AVG semantics). */
  def oAvg(e: String, digits: Int): String =
    s"(${oSum(e, digits)})/cast(count($e) as bigint)"

  /** count(*) as Spark's LongType. */
  val oCount: String = "cast(count(*) as bigint)"
}
