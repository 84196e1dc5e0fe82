package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling hashes of ALL k-byte substrings of a string, in one O(n) pass.
  *
  * Element i is the [[RollingHash]] polynomial (h ← h·P + bᵢ, mod 2⁶⁴ via
  * long wrap-around) of the k UTF-8 bytes starting at byte offset i — but
  * computed by the Karp–Rabin slide (subtract the leaving byte's P^(k−1)
  * term, multiply by P, add the entering byte), so the whole array costs
  * O(n) rather than the O(n·k) of hashing each window independently.
  * Strings shorter than k yield an empty array. This is the scan kernel
  * for substring-level exact dedup: at 100 TB the fingerprint pass is a
  * pure whole-stage-codegen projection with no UDF fence.
  */
case class KgramHashes(child: Expression, k: Int, prime: Long = 31L)
    extends UnaryExpression {

  require(k >= 1, s"k-gram size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kgram_hashes"

  /** P^(k−1) mod 2⁶⁴ — the weight of the window's leading byte. */
  private val lead: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p *= prime; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nw = bytes.length - k + 1
    if (nw <= 0) ArrayData.toArrayData(Array.empty[Long])
    else {
      val hs = new Array[Long](nw)
      var h = 0L
      var i = 0
      while (i < k) { h = h * prime + (bytes(i) & 0xff); i += 1 }
      hs(0) = h
      i = 1
      while (i < nw) {
        h = (h - (bytes(i - 1) & 0xff) * lead) * prime + (bytes(i + k - 1) & 0xff)
        hs(i) = h
        i += 1
      }
      ArrayData.toArrayData(hs)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val nw = ctx.freshName("nw")
      val hs = ctx.freshName("hs")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $nw = $bytes.length - $k + 1;
         |long[] $hs = new long[$nw > 0 ? $nw : 0];
         |if ($nw > 0) {
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    $h = $h * ${prime}L + ($bytes[$i] & 0xff);
         |  }
         |  $hs[0] = $h;
         |  for (int $i = 1; $i < $nw; $i++) {
         |    $h = ($h - ($bytes[$i - 1] & 0xff) * ${lead}L) * ${prime}L
         |       + ($bytes[$i + $k - 1] & 0xff);
         |    $hs[$i] = $h;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($hs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KgramHashes =
    copy(child = newChild)
}

object KgramHashes {
  /** Register the variant-specific SQL name and return it. BOTH
    * constructor parameters are baked into the name — registration is
    * ensure-if-absent, so a name that omitted `prime` would silently
    * serve prime-31 hashes to a caller asking for another prime. */
  def registered(spark: SparkSession, k: Int, prime: Long = 31L): String = {
    val name = s"kgram_hashes_${k}_$prime"
    Registry.ensure(spark, name)(exprs => KgramHashes(exprs.head, k, prime))
    name
  }

  def kgramHashes(spark: SparkSession, c: Column, k: Int, prime: Long = 31L): Column =
    org.apache.spark.sql.functions.call_function(registered(spark, k, prime), c)
}
