package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two FLOAT/DOUBLE
  * arrays, computed in a primitive loop with double accumulation —
  * the codegen'd scalar-function path (SURVEY.md §2.4 preference:
  * Expression > UDF > anything else). Interpreted higher-order
  * `aggregate(zip_with(...))` chains evaluate a lambda per element;
  * this emits one fused loop.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // analysis-time validation: non-array / wrong-element-type arguments
  // become an AnalysisException instead of a ClassCastException during
  // planning or codegen
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cosine_sim expects two ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val yGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.$xGet($i);
         |  double $yi = (double) $y.$yGet($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
         |  : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** SQL + Column registration: after register(spark), use
    * `cosine_sim(a, b)` (call_function) or SQL `cosine_sim(v1, v2)`.
    * Idempotent per session — query builders call it freely without
    * re-registration (or the "replaced a previously registered
    * function" log spam a bench suite would otherwise emit). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"))) return
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        // plain-message form: arity failure must not depend on Spark's
        // internal error-class registry (names/params change across
        // releases and would turn this into a missing-error-class crash)
        if (exprs.length != 2) throw new org.apache.spark.sql.AnalysisException(
          s"cosine_sim expects exactly 2 arguments, got ${exprs.length}",
          None, None, None, None, Map.empty,
          Array.empty[org.apache.spark.QueryContext])
        CosineSim(exprs(0), exprs(1))
      }, "built-in")
  }

  /** Column API via the registered name (register(spark) first). */
  def cosine_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
}
