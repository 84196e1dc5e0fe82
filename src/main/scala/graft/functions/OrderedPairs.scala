package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
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
  * in one compiled two-index loop.
  *
  * Element type is taken from the child array (ids may be long, string, …);
  * pair order — (arr[i], arr[j]) for i < j — matches the lambda form
  * exactly, so plans and oracles are unaffected.
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression {

  private lazy val elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

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
    // pair count in Long — see OrderedPairsPacked: n ≥ 65,536 would
    // overflow the Int product and allocate a corrupt array
    val total = n.toLong * (n - 1) / 2
    require(total <= Int.MaxValue,
      s"ordered_pairs: posting of $n docs yields $total pairs (> Int.MaxValue); " +
        "cap or split frequent shingles before pair generation")
    val out = new Array[Any](total.toInt)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = arr.get(i, elem)
      var j = i + 1
      while (j < n) {
        out(idx) = InternalRow(a, arr.get(j, elem))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
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
      // assignment boxing (primitive -> Object slot) is Janino-supported;
      // nulls bypass the typed accessor entirely, no ternary unbox trap
      def boxed(pos: String, dst: String): String =
        s"""
           |Object $dst = null;
           |if (!$c.isNullAt($pos)) {
           |  $dst = (Object) ${CodeGenerator.getValue(c, elem, pos)};
           |}
         """.stripMargin
      s"""
         |int $n = $c.numElements();
         |long $total = (long) $n * ($n - 1) / 2;
         |if ($total > Integer.MAX_VALUE) {
         |  throw new IllegalArgumentException(
         |    "ordered_pairs: posting of " + $n + " docs yields " + $total +
         |    " pairs (> Int.MaxValue); cap or split frequent shingles before pair generation");
         |}
         |Object[] $out = new Object[(int) $total];
         |int $idx = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${boxed(i, a)}
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    ${boxed(j, b)}
         |    $out[$idx++] = new org.apache.spark.sql.catalyst.expressions
         |      .GenericInternalRow(new Object[] { $a, $b });
         |  }
         |}
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
