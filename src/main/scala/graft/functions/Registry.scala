package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent temp-function registration. Operators register their
  * compiled expressions on every call; re-registering an existing name
  * made SimpleFunctionRegistry WARN "replaced a previously registered
  * function" once per call — hundreds of stderr lines per bench run,
  * all competing with the medians line for the driver's ~2 KB output
  * tail. Registration is keyed so a name always maps to the same
  * expression shape (variant parameters are baked into the name), so
  * skipping the re-registration is safe.
  */
private[functions] object Registry {
  def ensure(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
