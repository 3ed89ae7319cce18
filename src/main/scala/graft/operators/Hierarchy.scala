package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening by POINTER JUMPING (path doubling).
  *
  * Input: one (node, parent) row per node, roots SELF-PARENTED
  * (parent == node). Output: one (node, root, depth) row per node —
  * the transitive "WITH RECURSIVE walk-to-root" neither Spark SQL nor
  * the DataFrame API expresses natively.
  *
  * Scale design (the reason this is not a per-level BFS): each
  * iteration substitutes every node's known ancestor with THAT
  * ancestor's known ancestor, so the known distance DOUBLES — a
  * 10-million-deep chain flattens in 24 shuffle joins, not 10 million.
  * Per iteration the work is ONE self equi-join on the ancestor key
  * (hash-partitioned both sides, no broadcast assumption — the frame
  * is corpus-sized) plus one tiny convergence aggregate.
  * `localCheckpoint` truncates the lineage each round; otherwise the
  * plan doubles per iteration and the log-depth win is lost to
  * re-execution. Converged rows (ancestor already the root) join the
  * root's (root, root, 0) row and are unchanged — fixpoint is reached
  * exactly when the total depth sum stops growing, a single-long
  * driver check per round.
  */
object Hierarchy {

  /** @param edges (node: long, parent: long), roots self-parented;
    *              every parent value must itself appear as a node.
    * @return (flattened (node, root, depth), iterations run) */
  def flatten(edges: DataFrame, maxIters: Int = 48): (DataFrame, Int) = {
    var cur = edges
      .select(col("node"), col("parent").as("anc"),
        when(col("parent") === col("node"), 0L).otherwise(1L).as("depth"))
      .localCheckpoint()
    def depthSum(df: DataFrame): Long =
      df.agg(sum(col("depth"))).collect()(0).getLong(0)
    var last = -1L
    var s = depthSum(cur)
    var iters = 0
    while (s != last && iters < maxIters) {
      val b = cur.select(col("node").as("b_node"), col("anc").as("b_anc"),
        col("depth").as("b_depth"))
      cur = cur.join(b, cur("anc") === b("b_node"))
        .select(col("node"), col("b_anc").as("anc"),
          (col("depth") + col("b_depth")).as("depth"))
        .localCheckpoint()
      last = s
      s = depthSum(cur)
      iters += 1
    }
    (cur.select(col("node"), col("anc").as("root"), col("depth")), iters)
  }
}
