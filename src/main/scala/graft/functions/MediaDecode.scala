package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Codegen'd decode expressions for the media codec family: each parses a
  * payload's real container grammar and returns a typed stats STRUCT, or
  * NULL for a malformed payload (the codec error contract). These replace
  * the last two `.rdd.mapPartitions` sites in `operators.Multimodal` — the
  * byte work now runs inside whole-stage codegen next to encode/resize,
  * with no RDD serialization fence. Both eval paths call one JVM kernel
  * (the companion's `decode`), the codegen path through the companion's
  * static forwarder, so interpreted and generated results are one code
  * path — the ResizePpm/KgramHashes pattern.
  */

/** PPM (P6) image decode → struct(width, height, maxval, features) where
  * `features` are the R/G/B channel means computed as exact integer sums
  * over w·h samples divided once at the end — replayable bit-for-bit by
  * an external SQL engine (q25's oracle does). */
case class PpmFeatures(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PpmFeatures.Out
  override def nullable: Boolean = true // malformed payload → null struct
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ppm_features"

  override def nullSafeEval(input: Any): Any =
    PpmFeatures.decode(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // `nullable = true` guarantees ev.isNull is a mutable variable here
      s"""
         |${ev.value} = graft.functions.PpmFeatures$$.MODULE$$.decode($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PpmFeatures =
    copy(child = newChild)
}

object PpmFeatures {
  private[functions] val Out: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("maxval", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** The decode kernel shared by interpreted eval and generated code; one
    * parser for the whole codec family (`Multimodal.parsePpm`). */
  def decode(bytes: Array[Byte]): InternalRow =
    graft.operators.Multimodal.parsePpm(bytes) match {
      case Some((w, h, maxval, off)) =>
        val n = w * h
        val sums = new Array[Long](3)
        var i = 0
        while (i < 3 * n) {
          sums(i % 3) += bytes(off + i) & 0xff
          i += 1
        }
        new GenericInternalRow(Array[Any](
          w.toLong, h.toLong, maxval.toLong,
          new GenericArrayData(sums.map(s => s.toDouble / n.toDouble))))
      case None => null
    }

  def registered(spark: SparkSession): String = {
    val name = "ppm_features"
    Registry.ensure(spark, name)(exprs => PpmFeatures(exprs.head))
    name
  }

  def ppmFeatures(spark: SparkSession, c: Column): Column =
    org.apache.spark.sql.functions.call_function(registered(spark), c)
}

/** WAV (RIFF/PCM16 mono) audio decode → struct(sample_rate, n_samples,
  * sum_samples, peak): walk the real RIFF chunk list, validate 16-bit PCM
  * mono, and reduce the LE int16 samples to exact integer statistics —
  * replayable bit-for-bit from the source bytes (q78's oracle does). */
case class WavStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WavStats.Out
  override def nullable: Boolean = true // malformed container → null struct
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wav_stats"

  override def nullSafeEval(input: Any): Any =
    WavStats.decode(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WavStats$$.MODULE$$.decode($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavStats =
    copy(child = newChild)
}

object WavStats {
  private[functions] val Out: StructType = StructType(Seq(
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_samples", LongType, nullable = false),
    StructField("peak", LongType, nullable = false)))

  def decode(bytes: Array[Byte]): InternalRow =
    graft.operators.Multimodal.parseWav(bytes) match {
      case Some((rate, off, dataLen)) =>
        val n = dataLen / 2
        var sum = 0L
        var peak = 0L
        var k = 0
        while (k < n) {
          val lo = bytes(off + 2 * k) & 0xff
          val hi = bytes(off + 2 * k + 1)
          val s = (hi << 8) | lo // hi is sign-extended ⇒ signed int16
          sum += s
          val a = math.abs(s.toLong)
          if (a > peak) peak = a
          k += 1
        }
        new GenericInternalRow(Array[Any](rate.toLong, n.toLong, sum, peak))
      case None => null
    }

  def registered(spark: SparkSession): String = {
    val name = "wav_stats"
    Registry.ensure(spark, name)(exprs => WavStats(exprs.head))
    name
  }

  def wavStats(spark: SparkSession, c: Column): Column =
    org.apache.spark.sql.functions.call_function(registered(spark), c)
}
