package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{RollingHash, VectorDot}

/** Session-extension entry point: registers the engine's native Catalyst
  * expressions for pure-SQL users. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (no code changes needed on
  * the consumer side):
  *
  * {{{
  *   SELECT vector_dot(a.embedding, b.embedding)   -- codegen'd dot product
  *   SELECT rolling_hash(text)                     -- polynomial fingerprint
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorDot(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(exprs.head)))
    // whole-operator extension: the native bounded top-k-per-group
    // (plans/TopKPerGroup) — logical node + partial/final heap physical plan
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
