package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: the index of the FIRST band (group of
  * `bandBits` bits, band 0 = the lowest) where two packed LSH
  * signatures agree, or -1 when none do.
  *
  * The banded-LSH self-join's in-stream dedupe: a pair colliding in c
  * of L bands meets the hash probe c times, and the classic fix — a
  * post-join `distinct()` — pays a full shuffle of the collision
  * stream (~8 rows per random pair at d3's 32×2-bit geometry, the
  * r13 wall). With the packed signature riding each band row, the
  * predicate `first_band_match(x.sig, y.sig) === x.b` keeps exactly
  * ONE visit per colliding pair — the duplicate visits die on a
  * few-ns bit loop BEFORE the cosine evaluates, and the distinct (and
  * its shuffle) disappears. Candidate SET is unchanged: a pair
  * survives iff at least one band matches, exactly the banding's
  * recall contract — this is a cost reshape, not a recall dial.
  */
case class FirstBandMatch(left: Expression, right: Expression,
    bandBits: Int, nBands: Int) extends BinaryExpression {
  require(bandBits > 0 && nBands > 0 && bandBits * nBands <= 64,
    s"bandBits=$bandBits nBands=$nBands must pack into one long")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "first_band_match"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"first_band_match expects two BIGINT signatures, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private val mask = (1L << bandBits) - 1

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xr = a.asInstanceOf[Long] ^ b.asInstanceOf[Long]
    var i = 0
    while (i < nBands) {
      if (((xr >>> (i * bandBits)) & mask) == 0L) return i
      i += 1
    }
    -1
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val xr = ctx.freshName("xr")
      val i = ctx.freshName("i")
      s"""
         |long $xr = $x ^ $y;
         |${ev.value} = -1;
         |for (int $i = 0; $i < $nBands; $i++) {
         |  if ((($xr >>> ($i * $bandBits)) & ${mask}L) == 0L) {
         |    ${ev.value} = $i; break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstBandMatch =
    copy(left = newLeft, right = newRight)
}

object FirstBandMatch {

  /** Session registration (the CosineSim pattern): geometry arrives as
    * literal int arguments and folds into the expression at analysis
    * time. Idempotent per session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("first_band_match"))) return
    reg.createOrReplaceTempFunction(
      "first_band_match", exprs => {
        def intOf(e: Expression): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new org.apache.spark.sql.AnalysisException(
            s"first_band_match geometry arguments must be int literals, got $other",
            None, None, None, None, Map.empty,
            Array.empty[org.apache.spark.QueryContext])
        }
        if (exprs.length != 4) throw new org.apache.spark.sql.AnalysisException(
          s"first_band_match expects exactly 4 arguments, got ${exprs.length}",
          None, None, None, None, Map.empty,
          Array.empty[org.apache.spark.QueryContext])
        FirstBandMatch(exprs(0), exprs(1), intOf(exprs(2)), intOf(exprs(3)))
      }, "built-in")
  }

  /** Column API via the registered name (register(spark) first). */
  def first_band_match(a: Column, b: Column, bandBits: Int, nBands: Int): Column =
    org.apache.spark.sql.functions.call_function("first_band_match",
      a, b, org.apache.spark.sql.functions.lit(bandBits),
      org.apache.spark.sql.functions.lit(nBands))
}
