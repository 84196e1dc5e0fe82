package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Nearest-neighbor PPM (P6) resize as a codegen'd unary expression.
  *
  * Target pixel (x, y) copies source pixel (⌊x·w/w2⌋, ⌊y·h/h2⌋) — exact
  * integer arithmetic, so an external engine can replay the resized plane
  * byte-for-byte from the source image (q101's oracle does). The output is
  * a VALID P6 payload (fresh header + sampled triplets), so resize chains
  * with decode/frame-sample like any other media op; a malformed source
  * yields NULL (the codec family's decode-error contract).
  *
  * This used to be the one media op on `.rdd.mapPartitions`; as an
  * expression the byte work runs inside whole-stage codegen next to its
  * codec siblings (encode/decode/feature-extract) — no RDD serialization
  * fence, no UDF. Both eval paths call the same JVM kernel
  * ([[ResizePpm.resize]]), the codegen path through the companion's static
  * forwarder, so interpreted and generated results are one code path.
  *
  * Scale shape: pure per-row byte work in a projection — no shuffle;
  * 100 TB of thumbnails is an embarrassingly parallel scan.
  */
case class ResizePpm(child: Expression, w2: Int, h2: Int)
    extends UnaryExpression {

  require(w2 > 0 && h2 > 0, "target geometry must be positive")
  // 3·w2·h2 is computed in Int by the kernel — reject geometries whose
  // pixel plane would overflow (wrap-to-negative ⇒
  // NegativeArraySizeException mid-task instead of a clean argument error)
  require(3L * w2 * h2 + 64L <= Int.MaxValue,
    s"target plane 3*$w2*$h2 exceeds a byte-array's addressable size")

  override def dataType: DataType = BinaryType
  // NULL for malformed payloads even when the input is non-null
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "resize_ppm"

  override def nullSafeEval(input: Any): Any =
    ResizePpm.resize(input.asInstanceOf[Array[Byte]], w2, h2)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // `nullable = true` guarantees ev.isNull is a mutable variable here
      s"""
         |${ev.value} = graft.functions.ResizePpm$$.MODULE$$.resize($c, $w2, $h2);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ResizePpm =
    copy(child = newChild)
}

object ResizePpm {

  /** The resize kernel shared by interpreted eval and generated code:
    * parse the P6 header (one parser for the whole codec family —
    * `Multimodal.parsePpm`), emit a fresh header for the target geometry,
    * then copy one source triplet per target pixel. Returns null for
    * payloads that don't parse as P6.
    */
  def resize(bytes: Array[Byte], w2: Int, h2: Int): Array[Byte] =
    graft.operators.Multimodal.parsePpm(bytes) match {
      case Some((w, h, maxval, off)) =>
        val header = s"P6\n$w2 $h2\n$maxval\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + 3 * w2 * h2)
        System.arraycopy(header, 0, out, 0, header.length)
        var y = 0
        var o = header.length
        while (y < h2) {
          // Long products: x·w / y·h overflow Int for target geometries
          // the plane-size guard accepts
          val sy = (y.toLong * h / h2).toInt
          var x = 0
          while (x < w2) {
            val sx = (x.toLong * w / w2).toInt
            val sp = off + 3 * (sy * w + sx)
            out(o) = bytes(sp); out(o + 1) = bytes(sp + 1); out(o + 2) = bytes(sp + 2)
            o += 3; x += 1
          }
          y += 1
        }
        out
      case None => null
    }

  /** Register the geometry-specific SQL name and return it. BOTH target
    * dimensions are baked into the name — registration is
    * ensure-if-absent, so a name that omitted them would silently serve
    * one geometry to a caller asking for another (the KgramHashes
    * contract).
    */
  def registered(spark: SparkSession, w2: Int, h2: Int): String = {
    val name = s"resize_ppm_${w2}_$h2"
    Registry.ensure(spark, name)(exprs => ResizePpm(exprs.head, w2, h2))
    name
  }

  def resizePpm(spark: SparkSession, c: Column, w2: Int, h2: Int): Column =
    org.apache.spark.sql.functions.call_function(registered(spark, w2, h2), c)
}
