package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: dot product of two `array<long>`
  * vectors, in pure 64-bit integer arithmetic.
  *
  * The builtin composition (`aggregate(zip_with(a,b,_*_), 0L, _+_)`)
  * is a CodegenFallback pair — per row it allocates the zipped array
  * and walks it through interpreted lambdas. On a bounded candidate
  * PAIR stream that is fine; on a multi-million-pair near-dup
  * verification it is the dominant term (round-11 profile: the
  * mm_semantic verdict spent ~3 interpreted folds per pair over
  * 2.2M pairs). This expression fuses the fold into one allocation-
  * free loop in both the interpreted path and generated code —
  * whole-stage codegen keeps the filter it feeds in the same stage.
  *
  * Exactness: inputs are integer-valued (signed token-hash counts),
  * products and sums stay far below 2^63 (|dot| ≤ √(norm²_a·norm²_b);
  * the rational τ comparison multiplies by ≤ 25 — safe for any doc
  * under ~10^8 tokens), so the value is EXACT and identical to the
  * builtin double fold (doubles are exact integers below 2^53) and
  * to the DuckDB mirror's list_reduce over the same values — swapping
  * implementations never changes a verdict bit. Null semantics mirror
  * the builtin fold: mismatched lengths / null elements yield NULL. */
case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) =
      t == ArrayType(LongType, false) || t == ArrayType(LongType, true)
    if (!ok(left.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"left side must be array<long>, got ${left.dataType}")
    else if (!ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right side must be array<long>, got ${right.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)
}
