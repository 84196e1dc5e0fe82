package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends UnaryExpression with CodegenFallback {

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

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "ordered_pairs")(exprs => OrderedPairs(exprs.head))
}
