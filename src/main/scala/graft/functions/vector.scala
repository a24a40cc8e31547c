package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (§2.C/D).
  *
  * Implemented as sequential left-folds in double precision via the
  * codegen'd `zip_with`/`aggregate` builtins. The element product is
  * computed in FLOAT (both engines), accumulated in DOUBLE — the
  * DuckDB oracle mirrors the same fold, so cosine values compare
  * bit-identical. At 100 TB this is a narrow map: no shuffle, no
  * driver involvement, and the fold codegens into the row loop.
  */
object vector {

  /** Sequential-fold dot product: float multiplies, double accumulate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc, v) => acc + v.cast("double"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the builtin fold composition (works for any numeric
    * array types, e.g. a float embedding against a double literal
    * hyperplane). */
  def cosineFold(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine of two `array<float>` columns via the native fused
    * Catalyst expression (graft.plans.CosineSimilarityExpr): one pass,
    * no intermediate arrays, same arithmetic order as cosineFold —
    * results are bit-identical, only faster. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.CosineSimilarityExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Integer dot of two `array<long>` columns via the native fused
    * Catalyst expression (graft.plans.DotLongExpr): one allocation-
    * free pass, exact, value-identical to the builtin fold (and the
    * SQL mirror) on integer-valued inputs — only faster. */
  def dotLong(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.DotLongExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Matching DuckDB SQL fragments (same fold shape). */
  object sql {
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(cast(0.0 as double), " +
        s"list_transform(range(1, len($a)+1), i -> cast($a[i]*$b[i] as double))), " +
        s"(acc, x) -> acc + x)"
    def norm(a: String): String = s"sqrt(${dot(a, a)})"
    def cosine(a: String, b: String): String =
      s"(${dot(a, b)} / (${norm(a)} * ${norm(b)}))"
  }
}
