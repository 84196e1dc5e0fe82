package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column.
  *
  * The composable form — `array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", element_at(...)...)))` — runs on Catalyst's INTERPRETED
  * higher-order-function path (lambdas have no codegen), measured at
  * ~1.2 ms per 50-word document: the single most expensive step of every
  * shingle-based dedup operator. This expression does the same work in one
  * compiled pass over the split words (~µs per document).
  *
  * Semantics match the composable form and the DuckDB oracle exactly:
  * split on a literal single space keeping empty tokens, n-grams joined
  * by a single space, de-duplicated preserving first occurrence, empty
  * array when the document has fewer than n words.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i + n <= words.length) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = words(i + k); k += 1 }
        seen.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray().asInstanceOf[Array[Any]])
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Register (idempotently) and return the n-specific SQL name. */
  def registered(spark: SparkSession, n: Int): String = {
    val name = s"word_shingles_$n"
    Registry.ensure(spark, name)(exprs => WordShingles(exprs.head, n))
    name
  }
}
