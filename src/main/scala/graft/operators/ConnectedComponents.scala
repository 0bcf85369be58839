package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * clustering step after candidate-pair generation in a dedup pipeline
  * (pairs → duplicate groups → one canonical doc per group).
  *
  * Each iteration propagates the minimum label across edges and converges
  * when no label changes; iterations are O(diameter), which for near-dup
  * graphs (small, dense clusters) is 2–3 rounds. Inputs persist per round
  * so each iteration is one join + one aggregation. At extreme scale the
  * same loop carries over to the large-star/small-star variant
  * (alternating edge rewrites) without changing callers.
  */
object ConnectedComponents {

  /** @param vertices single-column DataFrame `id`
    * @param edges    two-column DataFrame `src`, `dst` (undirected)
    * @return `id`, `component` (= min reachable id)
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint per round truncates the lineage — without it the
    // plan (and per-iteration analysis/codegen time) grows linearly with
    // the iteration count, which dominates wall-clock long before data
    // size does.
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    // Labels only ever decrease, so the label sum is strictly decreasing
    // until the fixpoint — one aggregation job per round decides
    // convergence (no join against the previous labels needed).
    var prevSum = java.math.BigDecimal.valueOf(Long.MaxValue)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaEdges = sym
        .join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .unionByName(viaEdges)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      val s = next.agg(sum(col("component")).cast("decimal(38,0)")).collect()(0)
        .getDecimal(0)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    labels
  }
}
