package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge list to a token sequence.
  *
  * Rules are applied strictly in priority order; each rule makes ONE
  * left-to-right greedy pass that fuses every non-overlapping adjacent
  * occurrence of its pair `(a, b)` into the phrase symbol `"a b"`
  * (space-joined, so a merged symbol can never collide with a raw word
  * and a single pass per rule is the fixed point). This is the standard
  * tokenizer-APPLY step over a vocabulary learned by
  * [[graft.operators.TextOps.mergeCandidates]] — the train/apply split
  * of every BPE pipeline.
  *
  * The merge table rides inside the expression (a driver-collected
  * vocabulary is model state, like any broadcast model), so applying it
  * to 100 TB of text is a pure projection: no join, no shuffle, no UDF
  * serialization boundary — each row costs O(rules · tokens).
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  // element nullability follows the input: a null TOKEN (nullIntolerant
  // only covers a null array) matches no rule and is copied through, so
  // claiming containsNull=false for a nullable-element input would hand
  // the unsafe writer a null it was promised not to see
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_apply"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> tokens, got ${other.simpleString}")
    }

  // pre-encode the rule table once per expression instance
  @transient private lazy val table: Array[(UTF8String, UTF8String, UTF8String)] =
    merges.map { case (a, b) =>
      (UTF8String.fromString(a), UTF8String.fromString(b),
        UTF8String.fromString(a + " " + b))
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var toks = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < toks.length) { toks(i) = arr.getUTF8String(i); i += 1 }
    var r = 0
    while (r < table.length) {
      val (a, b, ab) = table(r)
      // pre-scan for the first occurrence: most rules match nothing in a
      // given row, and skipping the output allocation + copy for those
      // keeps the dominant tokenize stage at ~O(rules·tokens) comparisons
      // with allocations only proportional to rules that actually fire
      var f = 0
      while (f + 1 < toks.length && !(toks(f) == a && toks(f + 1) == b)) f += 1
      if (f + 1 < toks.length) {
        val out = new Array[UTF8String](toks.length)
        System.arraycopy(toks, 0, out, 0, f) // unmatched prefix verbatim
        var n = f
        var j = f
        while (j < toks.length) {
          if (j + 1 < toks.length && toks(j) == a && toks(j + 1) == b) {
            out(n) = ab; n += 1; j += 2 // greedy: consume both, no overlap
          } else {
            out(n) = toks(j); n += 1; j += 1
          }
        }
        toks = java.util.Arrays.copyOf(out, n)
      }
      r += 1
    }
    new GenericArrayData(toks.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {
  /** Column wrapper: registers a merge-list-specific temp function. The
    * rules are baked into the expression, so the name must key on their
    * CONTENT — registration is ensure-if-absent, and a name collision
    * between different merge lists would silently tokenize with the
    * wrong vocabulary. md5 of the unambiguously-delimited rule text
    * makes that practically impossible. */
  def bpeApply(spark: SparkSession, tokens: Column, merges: Seq[(String, String)]): Column = {
    val blob = merges.map { case (a, b) => a + "\u0000" + b }.mkString("\u0001")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(blob.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val name = s"bpe_apply_$key"
    Registry.ensure(spark, name)(exprs => BpeApply(exprs.head, merges))
    org.apache.spark.sql.functions.call_function(name, tokens)
  }
}
