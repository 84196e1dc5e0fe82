package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float|double>` columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), ...)`) materializes
  * a transient 64-element array per row pair — at 2M candidate pairs that
  * is 2M allocations on the hot path. This expression loops directly over
  * the columnar `ArrayData` in generated code: zero allocation, stays in
  * whole-stage codegen.
  *
  * Arithmetic parity: elements are widened to double BEFORE the multiply
  * and accumulated left-to-right — bit-identical to the zip_with/aggregate
  * formulation and to the DuckDB oracle's double-list cosine. That parity
  * extends to the degenerate inputs: mismatched lengths and null elements
  * yield NULL (zip_with pads the short side with null and `acc + null` is
  * null), so a truncated or corrupt embedding surfaces as a null
  * similarity instead of a silently-truncated dot product.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null children OR degenerate inputs (length mismatch / null element)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  /** Analysis-time gate: the generated `getDouble`/`getFloat` strides are
    * only valid over float/double arrays — an int array would read garbage
    * (UnsafeArrayData is 4-byte-packed), so reject it before execution. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // schema-level guarantee: when BOTH element types are non-nullable the
  // per-element null scan is dead code and is not emitted at all
  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    // null scan SPLIT from the multiply loop: the scan reads the compact
    // null bitmaps; the multiply loop then stays a branch-free FMA chain
    if (mayHaveNullElems) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        i += 1
      }
    }
    val la = elemIsFloat(left); val lb = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (lb) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // separate bitmap scan (skipped entirely under a non-null schema)
      // so the hot multiply loop carries no per-element branch
      val nullScan = if (mayHaveNullElems)
        s"""
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |}
         """.stripMargin
      else ""
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |if (!$bad) {
         |  $nullScan
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $getA * $getB;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "vector_dot")(exprs => VectorDot(exprs.head, exprs(1)))
}
