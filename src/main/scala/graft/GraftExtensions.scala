package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point — the idiomatic way to install the
  * engine's native functions into EVERY session of an application:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * Injected at extension level the functions are part of the session's
  * catalog from birth (SQL, views, thrift-server clients all see them);
  * `CosineSim.register` remains as the runtime/per-session fallback the
  * query builders use when the session was built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Physical-plan rule (conf-gated, default off): exchange-free plans
    // for dim-sized inputs — see TinyExchangeElimination. Injected as a
    // columnar-rule pre-transition because that is the one extension
    // hook that runs AFTER EnsureRequirements on the non-adaptive path
    // (QueryExecution.preparations order: …, EnsureRequirements, …,
    // ApplyColumnarRulesAndInsertTransitions(sessionState.columnarRules),
    // CollapseCodegenStages, ReuseExchangeAndSubquery).
    ext.injectColumnar(_ => new org.apache.spark.sql.execution.ColumnarRule {
      override def preColumnarTransitions
          : org.apache.spark.sql.catalyst.rules.Rule[
            org.apache.spark.sql.execution.SparkPlan] =
        graft.plans.TinyExchangeElimination
    })
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            s"cosine_sim expects exactly 2 arguments, got ${exprs.length}",
            None, None, None, None, Map.empty,
            Array.empty[org.apache.spark.QueryContext])
        graft.functions.CosineSim(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("first_band_match"),
      new ExpressionInfo(
        classOf[graft.functions.FirstBandMatch].getName, "first_band_match"),
      (exprs: Seq[Expression]) => {
        def intOf(e: Expression): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other => throw new org.apache.spark.sql.AnalysisException(
            s"first_band_match geometry arguments must be int literals, got $other",
            None, None, None, None, Map.empty,
            Array.empty[org.apache.spark.QueryContext])
        }
        if (exprs.length != 4)
          throw new org.apache.spark.sql.AnalysisException(
            s"first_band_match expects exactly 4 arguments, got ${exprs.length}",
            None, None, None, None, Map.empty,
            Array.empty[org.apache.spark.QueryContext])
        graft.functions.FirstBandMatch(
          exprs(0), exprs(1), intOf(exprs(2)), intOf(exprs(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("json_int"),
      new ExpressionInfo(
        classOf[graft.functions.JsonIntGet].getName, "json_int"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            s"json_int expects exactly 2 arguments, got ${exprs.length}",
            None, None, None, None, Map.empty,
            Array.empty[org.apache.spark.QueryContext])
        graft.functions.JsonIntGet(exprs(0), exprs(1))
      }))
  }
}
