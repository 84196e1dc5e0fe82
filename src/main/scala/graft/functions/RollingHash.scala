package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * h = Σ bᵢ·P^(n−1−i) (mod 2⁶⁴), computed as the fold h ← h·P + bᵢ.
  *
  * A native Catalyst `Expression` with `doGenCode` — participates in
  * whole-stage codegen, so fingerprinting a 100 TB corpus is a pure scan
  * (no UDF serialization, no codegen fences). The rolling form also makes
  * windowed/chunked fingerprints cheap: the hash of a concatenation is
  * h(a)·P^len(b) + h(b).
  */
case class RollingHash(child: Expression, prime: Long = 31L)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * prime + (bytes(i) & 0xff); i += 1 }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${prime}L + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column wrapper (Spark 4: Expression → Column goes via the classic
    * converter, reached here through SQL registration to stay inside the
    * public API surface). */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "rolling_hash")(exprs => RollingHash(exprs.head))

  def rollingHash(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("rolling_hash", c)
  }
}
