package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE iterated-quadratic-map integer hash (mod 1e9+7) used wherever
  * an operator needs engine-reproducible pseudo-randomness (ANN
  * training samples and seeds, weighted-sampling draws): one
  * definition for the Column form and its nested-SQL twin, so the
  * constants and round count can never drift between consumers or
  * between an operator and its DuckDB oracle. All intermediates stay
  * below 2^63 (operands < 1e9+7 before each squaring), so any
  * 64-bit-int engine computes it exactly.
  *
  * (AnnOps.qhashCtes stages the SAME map as a CTE chain for mirrors
  * that hash a table column once; the nested form here is for list
  * lambdas, where CTE staging isn't available.)
  */
object ihash {
  val M = 1000000007L

  /** JVM form: the same three rounds over a plain Long — for typed
    * codec-boundary code (mapPartitions) that hashes per-byte features
    * where Column expressions aren't available. Must stay arithmetic-
    * identical to [[quad]]/[[quadSqlNested]] (one constants site). */
  def quadLong(x: Long): Long = {
    val h0 = ((x % M) * 999983L + 424243L) % M
    val h1 = (h0 * h0 + h0 * 48271L + 11L) % M
    (h1 * h1 + h1 * 48271L + 11L) % M
  }

  /** Column form: three rounds over a long column. */
  def quad(c: Column): Column = {
    val m = lit(M)
    val h0 = ((c % m) * lit(999983L) + lit(424243L)) % m
    val h1 = (h0 * h0 + h0 * lit(48271L) + lit(11L)) % m
    (h1 * h1 + h1 * lit(48271L) + lit(11L)) % m
  }

  /** The same three rounds as ONE nested SQL expression over `x` —
    * textually duplicated sub-expressions, identical arithmetic. */
  def quadSqlNested(x: String): String = {
    def h0(e: String) = s"((($e) % $M) * 999983 + 424243) % $M"
    def sq(e: String) = s"(($e)*($e) + ($e)*48271 + 11) % $M"
    sq(s"(${sq(s"(${h0(x)})")})")
  }
}
