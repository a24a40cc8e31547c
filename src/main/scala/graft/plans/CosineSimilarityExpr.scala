package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two
  * `array<float>` embeddings.
  *
  * Preference order from the engine's design notes: compose builtins
  * → custom Expression → custom plan node. The builtin composition
  * (`aggregate(zip_with(a,b,_*_), 0d, _+_)`) is correct but
  * materializes an intermediate array per row; this expression fuses
  * the three folds (dot, |a|², |b|²) into ONE pass over the two
  * arrays with no allocation, in both the interpreted path
  * (`nullSafeEval`) and generated code (`doGenCode`).
  *
  * Arithmetic order is IDENTICAL to the builtin composition and the
  * DuckDB oracle mirror (graft.functions.vector.sql): per-element
  * FLOAT multiply, sequential DOUBLE accumulate, one final
  * divide — so swapping implementations never changes a result bit.
  * Null semantics also mirror the builtin fold: mismatched lengths
  * and null elements yield NULL (not a silent truncated/garbage
  * result), so the fused expression is substitutable everywhere.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // can return null on length mismatch / null elements even when both
  // inputs are non-null
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(FloatType, false) ||
        left.dataType == ArrayType(FloatType, true)) {
      if (right.dataType == ArrayType(FloatType, false) ||
          right.dataType == ArrayType(FloatType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right side must be array<float>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"left side must be array<float>, got ${left.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i); val yi = y.getFloat(i)
      dot += (xi * yi).toDouble
      na += (xi * xi).toDouble
      nb += (yi * yi).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    float $xi = $a.getFloat($i);
         |    float $yi = $b.getFloat($i);
         |    $dot += (double)($xi * $yi);
         |    $na += (double)($xi * $xi);
         |    $nb += (double)($yi * $yi);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
