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
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    try {
      var labels = vertices.select(col("id"), col("id").as("component")).persist()
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        // candidate label for each vertex: min over own label and
        // neighbors' labels
        val viaEdges = sym
          .join(labels, sym("dst") === labels("id"))
          .select(sym("src").as("id"), col("component"))
        val next = labels.select(col("id"), col("component"))
          .unionByName(viaEdges)
          .groupBy("id").agg(min("component").as("component"))
          .persist()
        val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
          .filter(col("component") =!= col("old")).limit(1).count()
        labels.unpersist()
        labels = next
        converged = changed == 0
        iter += 1
      }
      labels
    } finally sym.unpersist()
  }
}
