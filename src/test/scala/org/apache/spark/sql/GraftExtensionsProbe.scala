package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only bridge into SparkSessionExtensions' private[sql] build/register
  * methods: `spark.sql.extensions` is a STATIC conf, so the build-time wiring
  * of graft.GraftExtensions cannot be exercised on the shared test
  * SparkContext by building another session — this probe applies the
  * extension object to a fresh SparkSessionExtensions and exposes what it
  * registered. */
object GraftExtensionsProbe {

  def optimizerRules(spark: SparkSession,
      conf: SparkSessionExtensions => Unit): Seq[Rule[LogicalPlan]] = {
    val ext = new SparkSessionExtensions
    conf(ext)
    ext.buildOptimizerRules(spark)
  }

  /** Resolve `name(args)` through a registry carrying ONLY builtins plus the
    * extension's injected functions. */
  def resolveFunction(conf: SparkSessionExtensions => Unit,
      name: String, args: Seq[Expression]): Expression = {
    val ext = new SparkSessionExtensions
    conf(ext)
    val registry = ext.registerFunctions(FunctionRegistry.builtin.clone())
    registry.lookupFunction(FunctionIdentifier(name), args)
  }
}
