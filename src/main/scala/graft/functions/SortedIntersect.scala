package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression for the set-similarity verify step
  * (l2/d1 prefix-filter joins): given two SORTED ascending LONG hash
  * arrays and the prefix hash `p` the candidate pair joined on,
  * return |A∩B| when `p` is the SMALLEST common element, else -1.
  *
  * One merge walk replaces BOTH of the generic plan's costly pieces:
  *  - `size(array_intersect(a, b))` builds a per-row hash set
  *    (allocation + hashing per element; the verify stage is the
  *    dominant cost of the pair join), while sorted inputs need only
  *    a branchy O(|A|+|B|) scan with zero allocation;
  *  - the `.distinct()` that collapsed multi-prefix duplicate pairs
  *    (an extra exchange): a pair sharing k prefix hashes joins k
  *    times, but only ONE of those joins carries the smallest common
  *    hash — the classic PPJoin positional dedup, evaluated here for
  *    free inside the same walk. Filter `>= 0` and the duplicates are
  *    gone before they reach any exchange.
  */
case class SortedIntersectSizeIfFirst(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(first.dataType) && ok(second.dataType) && third.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_size_if_first expects (ARRAY<BIGINT>, ARRAY<BIGINT>, " +
        s"BIGINT), got ${first.dataType.sql}, ${second.dataType.sql}, " +
        third.dataType.sql)
  }

  override def nullSafeEval(a: Any, b: Any, p: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val pv = p.asInstanceOf[Long]
    val la = x.numElements(); val lb = y.numElements()
    var i = 0; var j = 0; var n = 0
    var head = 0L; var hasHead = false
    while (i < la && j < lb) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) {
        if (!hasHead) { head = u; hasHead = true }
        n += 1; i += 1; j += 1
      } else if (u < v) i += 1
      else j += 1
    }
    if (hasHead && head == pv) n else -1
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, p) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val la = ctx.freshName("la")
      val lb = ctx.freshName("lb"); val u = ctx.freshName("u")
      val v = ctx.freshName("v"); val head = ctx.freshName("head")
      val hasHead = ctx.freshName("hasHead")
      s"""
         |int $la = $x.numElements(); int $lb = $y.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |long $head = 0L; boolean $hasHead = false;
         |while ($i < $la && $j < $lb) {
         |  long $u = $x.getLong($i); long $v = $y.getLong($j);
         |  if ($u == $v) {
         |    if (!$hasHead) { $head = $u; $hasHead = true; }
         |    $n++; $i++; $j++;
         |  } else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = ($hasHead && $head == $p) ? $n : -1;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** 2-arg sibling of [[SortedIntersectSizeIfFirst]] for verifies whose
  * candidate dedup key is NOT an element of the sets (d1's multi-band
  * collisions): plain |A∩B| by merge walk over sorted LONG arrays —
  * same zero-allocation replacement for `size(array_intersect(...))`,
  * without the positional filter. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_size expects two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val la = x.numElements(); val lb = y.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < la && j < lb) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { n += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val la = ctx.freshName("la")
      val lb = ctx.freshName("lb"); val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |int $la = $x.numElements(); int $lb = $y.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $la && $j < $lb) {
         |  long $u = $x.getLong($i); long $v = $y.getLong($j);
         |  if ($u == $v) { $n++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Idempotent SQL + Column registration (same pattern as CosineSim). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(org.apache.spark.sql.catalyst
        .FunctionIdentifier("sorted_intersect_size"))) return
    reg.createOrReplaceTempFunction(
      "sorted_intersect_size", exprs => {
        if (exprs.length != 2) throw new org.apache.spark.sql.AnalysisException(
          s"sorted_intersect_size expects exactly 2 arguments, got ${exprs.length}",
          None, None, None, None, Map.empty,
          Array.empty[org.apache.spark.QueryContext])
        SortedIntersectSize(exprs(0), exprs(1))
      }, "built-in")
  }

  def sorted_intersect_size(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_intersect_size", a, b)
}

object SortedIntersectSizeIfFirst {
  /** Idempotent SQL + Column registration (same pattern as CosineSim). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(org.apache.spark.sql.catalyst
        .FunctionIdentifier("sorted_intersect_size_if_first"))) return
    reg.createOrReplaceTempFunction(
      "sorted_intersect_size_if_first", exprs => {
        if (exprs.length != 3) throw new org.apache.spark.sql.AnalysisException(
          s"sorted_intersect_size_if_first expects exactly 3 arguments, " +
            s"got ${exprs.length}",
          None, None, None, None, Map.empty,
          Array.empty[org.apache.spark.QueryContext])
        SortedIntersectSizeIfFirst(exprs(0), exprs(1), exprs(2))
      }, "built-in")
  }

  def sorted_intersect_size_if_first(a: Column, b: Column, p: Column): Column =
    org.apache.spark.sql.functions
      .call_function("sorted_intersect_size_if_first", a, b, p)
}
