package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** All ordered (i < j) element pairs of an array, as array<struct<a,b>>.
  *
  * The composable form — `flatten(transform(sequence(...), i =>
  * transform(sequence(i+1,...), j => struct(element_at...))))` — runs on
  * Catalyst's interpreted higher-order-function path: for a posting list of
  * length m that is m²/2 interpreted lambda frames and element_at calls PER
  * POSTING (the candidate-generation step of the inverted-index Jaccard
  * join evaluates millions of them). This expression emits the same pairs
  * in one compiled two-index loop — the [0, n) diagonal case of
  * [[PairGen]], which also supplies the blocked tile forms.
  *
  * Element type is taken from the child array (ids may be long, string, …);
  * pair order — (arr[i], arr[j]) for i < j — matches the lambda form
  * exactly, so plans and oracles are unaffected.
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression {

  private lazy val elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  /** Analysis-time gate (the expression is SQL-registered): a non-array
    * child would otherwise surface as a ClassCastException from `elem`
    * mid-plan instead of a typed analysis error. Any element type works. */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", elem, nullable = true),
      StructField("b", elem, nullable = true))),
    containsNull = false)

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ordered_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    new GenericArrayData(
      PairGen.structDiag(arr, elem, 0, n, s"$prettyName: posting of $n docs"))
  }

  // compiled like OrderedPairsPacked (see its Scaladoc: CodegenFallback
  // would demote the consuming Generate to the boxing interpreted explode)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val total = ctx.freshName("total")
      val out = ctx.freshName("out")
      val idx = ctx.freshName("idx")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      s"""
         |int $n = $c.numElements();
         |long $total = (long) $n * ($n - 1) / 2;
         |${PairGen.sizeGuardJava(total, s""""ordered_pairs: posting of " + $n + " docs"""")}
         |Object[] $out = new Object[(int) $total];
         |int $idx = 0;
         |${PairGen.structDiagJava(c, elem, "0", n, out, idx, i, j, a, b)}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "ordered_pairs")(exprs => OrderedPairs(exprs.head))
}
