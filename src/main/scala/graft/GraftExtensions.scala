package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point — the idiomatic way to install graft into
  * any Spark deployment without touching application code:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Installs at session build time:
  *  - the native `cosine_sim` expression (functions.CosineSim) into the
  *    function registry via injectFunction — resolves in SQL and
  *    `call_function` without any per-session register call;
  *  - the `travel_time_load_config` plan-time load rule
  *    (routing.RoutingFunctions.LoadConfigRule) via injectOptimizerRule, so
  *    `SELECT travel_time_load_config('<path>')` works as a session's first
  *    statement (the reference's script-opening contract,
  *    src/travel_time_extension.cpp:446-462). The routing UDF surface
  *    itself still binds per load (broadcast capture), via
  *    RoutingContext.install/loadConfig.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSim(exprs(0), exprs(1))))
    ext.injectOptimizerRule(spark => new routing.RoutingFunctions.LoadConfigRule(spark))
  }
}
