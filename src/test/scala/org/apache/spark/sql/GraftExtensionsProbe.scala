package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

/** Test bridge into the `private[sql]` build side of
  * SparkSessionExtensions — the only way to assert what a
  * `spark.sql.extensions=graft.expr.GraftExtensions` session would
  * receive without creating a fresh SparkContext (the conf is static).
  * Same pattern as the ColumnBridge shim the main sources use for
  * Spark 4's private Column constructor. */
object GraftExtensionsProbe {
  def build(spark: org.apache.spark.sql.SparkSession)
      : (Seq[Rule[LogicalPlan]], Seq[SparkStrategy], Set[String]) = {
    val ext = new SparkSessionExtensions
    new _root_.graft.expr.GraftExtensions()(ext)
    val reg = FunctionRegistry.builtin.clone()
    ext.registerFunctions(reg)
    val classic = spark.asInstanceOf[SparkSession]
    (ext.buildOptimizerRules(classic),
      ext.buildPlannerStrategies(classic),
      reg.listFunction().map(_.funcName).toSet)
  }
}
