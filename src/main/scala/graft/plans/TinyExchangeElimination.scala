package graft.plans

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{CoalesceExec, ColumnarRule, FileSourceScanExec, SparkPlan, UnionExec}
import org.apache.spark.sql.execution.exchange.{EnsureRequirements, ENSURE_REQUIREMENTS, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Exchange-free plans for dim-sized inputs (the per-query latency
  * floor, VERDICT r11 item 1).
  *
  * On a sub-`maxPartitionBytes` input every scan stage is a handful of
  * tasks, the map-side partial aggregate already collapses the data to
  * KB, and the ENSURE_REQUIREMENTS exchange that follows redistributes
  * those few rows across `spark.sql.shuffle.partitions` reducers — a
  * full shuffle round (file creation, serialization, a second
  * scheduling wave) that buys nothing. DuckDB pays none of this
  * in-process, which is exactly where the engine's fixed ~100 ms/query
  * floor on ≤12 MB inputs comes from.
  *
  * This rule removes that floor STATICALLY, the same decision AQE makes
  * at runtime (coalescing post-shuffle partitions) but without first
  * materializing the exchange: every ENSURE_REQUIREMENTS-origin
  * shuffle whose map side is estimated at ≤ `maxSlices` input slices
  * and ≤ `maxBytes` of source bytes is replaced by `CoalesceExec(1)` —
  * a narrow, zero-copy merge whose `SinglePartition` output satisfies
  * every distribution requirement — and `EnsureRequirements` is then
  * re-run to re-validate the whole tree (it re-inserts an exchange
  * wherever a replacement would have broken a binary operator's
  * co-partitioning, e.g. one tiny side joined against a still-shuffled
  * big side).
  *
  * Scale safety (100 TB intent):
  *  - Only ENSURE_REQUIREMENTS shuffles qualify. User-intent
  *    repartitions (`fanOut`'s REPARTITION_BY_NUM, REPARTITION_BY_COL,
  *    REBALANCE) express a parallelism decision and are never touched —
  *    a heavy shingle/MinHash kernel behind `fanOut` keeps its fan-out.
  *  - The slice estimate is driven by leaf FILE bytes (the same
  *    split formula as the scan planner, conservative direction): a
  *    100 TB fact table estimates at thousands of slices and the rule
  *    never fires. Any subtree with a non-file leaf (cached relation,
  *    in-memory scan, DSv2) is unknown → never fires.
  *  - AQE sessions skip the rule entirely: adaptive planning owns the
  *    runtime-partition decision there (and stage boundaries must stay
  *    exchanges for query-stage creation).
  *
  * Session surface: `spark.graft.tinyExchange.enabled` (default FALSE —
  * Verify's default sessions plan unchanged; the bench session and any
  * deployment serving dim-sized marts opt in), `.maxBytes` (default
  * 16 MB: the crossover — one core streams ~16 MB through a fused
  * scan+agg pipeline in roughly the wall one exchange round costs, so
  * above it serializing the stage loses more than the shuffle saves;
  * measured at the 10× corpus, a 27 MB input single-tasked cost
  * 0.4–1.4 s/query where the exchange-ful plan pays ~0.1 s), and
  * `.maxSlices` (default 4; a scan of ≤4 splits loses less to serial
  * decode than an exchange round costs).
  */
object TinyExchangeElimination extends Rule[SparkPlan] {

  val EnabledKey = "spark.graft.tinyExchange.enabled"
  val MaxBytesKey = "spark.graft.tinyExchange.maxBytes"
  val MaxSlicesKey = "spark.graft.tinyExchange.maxSlices"

  /** Estimated partition count of the stage `p` tops, from file-scan
    * byte totals (None = a leaf whose width we cannot know statically —
    * the rule must not fire over it). Mirrors the scan planner's
    * split math in the conservative direction: ceil(bytes/maxSplit)
    * underestimates splits when `filesMinPartitionNum` shrinks
    * maxSplitBytes, but an underestimate only makes the ≤ maxSlices
    * gate ADMIT a scan that actually has a few more splits — and
    * CoalesceExec(1) is correct (a narrow merge) at any width. */
  private def slices(p: SparkPlan, maxSplit: Long): Option[Long] = p match {
    case s: FileSourceScanExec =>
      val b = s.relation.location.sizeInBytes
      Some(((b + maxSplit - 1) / maxSplit).max(1L))
    case c: CoalesceExec =>
      slices(c.child, maxSplit).map(_.min(c.numPartitions.toLong))
    case e: ShuffleExchangeExec =>
      Some(e.outputPartitioning.numPartitions.toLong)
    case j: BroadcastHashJoinExec =>
      slices(if (j.buildSide == BuildRight) j.left else j.right, maxSplit)
    case j: BroadcastNestedLoopJoinExec =>
      slices(if (j.buildSide == BuildRight) j.left else j.right, maxSplit)
    case j: ShuffledHashJoinExec => slices(j.left, maxSplit) // zipped sides
    case j: SortMergeJoinExec => slices(j.left, maxSplit)
    case u: UnionExec =>
      u.children.foldLeft(Option(0L)) { (acc, c) =>
        acc.flatMap(a => slices(c, maxSplit).map(_ + a))
      }
    case u: org.apache.spark.sql.execution.UnaryExecNode =>
      slices(u.child, maxSplit)
    case _ => None
  }

  /** Total source bytes under `p` (None on any non-file leaf). */
  private def leafBytes(p: SparkPlan): Option[Long] = {
    val ls = p.collectLeaves()
    val known = ls.collect { case s: FileSourceScanExec =>
      s.relation.location.sizeInBytes }
    if (known.size == ls.size) Some(known.sum) else None
  }

  override def apply(plan: SparkPlan): SparkPlan = {
    val sqlConf = conf
    val enabled = sqlConf.getConfString(EnabledKey, "false").toBoolean
    if (!enabled || sqlConf.adaptiveExecutionEnabled) return plan
    // Stateful streaming plans key their state stores by partition id:
    // the exchange feeding a StateStoreSave/SymmetricHashJoin IS the
    // state layout contract across micro-batches and restarts. Never
    // rewrite a micro-batch plan (batch relations only below) — the
    // check covers the stateful operators (execution.streaming.*) and
    // the v2 micro-batch scan that stateless streams run on.
    if (plan.exists { p =>
      val n = p.getClass.getName
      n.startsWith("org.apache.spark.sql.execution.streaming") ||
        n == "org.apache.spark.sql.execution.datasources.v2.MicroBatchScanExec"
    }) return plan
    // At the injection point (preColumnarTransitions) exchange reuse
    // has not run yet, so no ReusedExchangeExec can exist; if this rule
    // is ever applied to a post-reuse tree (tests, future call sites),
    // rewriting a reuse TARGET would leave the reuse edge dangling into
    // a dropped subtree — skip such trees outright.
    if (plan.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ReusedExchangeExec]))
      return plan
    val maxBytes = sqlConf.getConfString(MaxBytesKey, (16L << 20).toString).toLong
    val maxSlices = sqlConf.getConfString(MaxSlicesKey, "4").toLong
    val maxSplit = sqlConf.filesMaxPartitionBytes.max(1L)
    var changed = false
    // transformUp rewrites inner exchanges first, so a chain of
    // qualifying stages cascades: once a join's two tiny sides are
    // coalesced, `slices` of the join itself reads 1 and the exchange
    // above it qualifies too.
    val stripped = plan.transformUp {
      case e: ShuffleExchangeExec if e.shuffleOrigin == ENSURE_REQUIREMENTS &&
          slices(e.child, maxSplit).exists(_ <= maxSlices) &&
          leafBytes(e.child).exists(_ <= maxBytes) =>
        changed = true
        CoalesceExec(1, e.child)
    }
    // Re-validate distributions over the rewritten tree: SinglePartition
    // satisfies every non-broadcast requirement, and where a coalesced
    // side faces a still-partitioned sibling EnsureRequirements restores
    // the exchange it needs — the rule can lose an optimization, never
    // correctness.
    if (changed) EnsureRequirements().apply(stripped) else plan
  }
}
