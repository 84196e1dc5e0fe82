package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All ordered (i < j) pairs of a long array, each packed into ONE long:
  * `(a << 32) | b`. Callers guarantee 0 ≤ id < 2³¹ (the Jaccard operators
  * gate on a measured min/max and fall back to [[OrderedPairs]] otherwise).
  *
  * Purpose-built for the candidate-generation hot loop of the inverted-
  * index Jaccard join: with ~10⁶–10⁹ emitted pairs, a primitive long array
  * (`UnsafeArrayData.fromPrimitiveArray`, zero boxing) replaces per-pair
  * `InternalRow` structs, and the downstream `groupBy` aggregates on a
  * single 8-byte key instead of a two-long row — less row-builder work,
  * smaller shuffle, faster hash probes. Unpacking after aggregation is two
  * bit ops per SURVIVING group. Packing is lossless, so plans using either
  * expression produce identical (a, b) pairs.
  *
  * Single-buffer by design: all m(m−1)/2 pairs materialize in one array —
  * Θ(m²) memory on a hot posting. The Jaccard operators therefore no
  * longer evaluate this form at all: they tile UNCONDITIONALLY through
  * [[OrderedPairsPackedBlock]] (a one-tile evaluation of which is this
  * expression exactly, for m ≤ the block size), keeping per-row memory
  * bounded with no plan-splitting size dispatch — see
  * `Dedup.explodedPairs` for why a two-leg union re-creates the OOM at a
  * codegen stage boundary. This single-shot form stays registered for
  * direct users, who own the memory trade-off (the guard below is the
  * Int-overflow backstop, not a memory guard).
  *
  * Real `doGenCode` (not CodegenFallback): a fallback expression disables
  * whole-stage codegen for its operator, demoting the consuming Generate
  * to the interpreted explode that wraps every pair in a boxed
  * `InternalRow` — the per-pair allocation this expression exists to
  * avoid. */
case class OrderedPairsPacked(child: Expression)
    extends UnaryExpression {

  /** Analysis-time gate (the expression is SQL-registered): `getLong` over
    * a non-8-byte element stride emits silent garbage pairs, so anything
    * but array<bigint> must die before execution. */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ordered_pairs_packed"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // PairGen guards the pair count in Long: n ≥ 65,536 overflows the Int
    // product and would allocate a corrupt (negative/short) array — fail
    // loudly instead; a posting list that hot should be df-capped
    // upstream, not paired
    UnsafeArrayData.fromPrimitiveArray(
      PairGen.packedDiag(arr, 0, n, s"$prettyName: posting of $n docs"))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val total = ctx.freshName("total")
      val out = ctx.freshName("out")
      val idx = ctx.freshName("idx")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |int $n = $c.numElements();
         |long $total = (long) $n * ($n - 1) / 2;
         |${PairGen.sizeGuardJava(total,
           s""""ordered_pairs_packed: posting of " + $n + " docs"""")}
         |long[] $out = new long[(int) $total];
         |int $idx = 0;
         |${PairGen.packedDiagJava(c, "0", n, out, idx, i, j, h)}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OrderedPairsPacked =
    copy(child = newChild)
}

object OrderedPairsPacked {
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "ordered_pairs_packed")(exprs => OrderedPairsPacked(exprs.head))
}
