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

  /** [[run]] with `vertices` = the edge-touched set, derived HERE from
    * the checkpointed edge frame. Every dedup-cluster caller used to
    * build `touched` from its own (expensive: verify-joined, filtered)
    * edges plan and pass both — so the edge subtree executed once for
    * `touched`'s materialization and once more inside [[run]]'s sym
    * build. Routing both through one eager checkpoint halves the
    * expensive part of the whole CC call (measured r11: q195's edge
    * subtree is ~40% of the query).
    */
  def runOnEdges(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val touched = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    core(touched, e, maxIter)
  }

  /** @param vertices single-column DataFrame `id`
    * @param edges    two-column DataFrame `src`, `dst` (undirected)
    * @return `id`, `component` (= min reachable id)
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame =
    core(vertices,
      edges.select(col("src"), col("dst")).localCheckpoint(), maxIter)

  /** The propagation loop; `e0` must already be checkpointed. */
  private def core(vertices: DataFrame, e0: DataFrame,
      maxIter: Int): DataFrame = {
    // localCheckpoint per round truncates the lineage — without it the
    // plan (and per-iteration analysis/codegen time) grows linearly with
    // the iteration count, which dominates wall-clock long before data
    // size does. Checkpoint discipline (r11, measured): `edges` is
    // checkpointed ONCE eagerly — it appears twice in sym's union (both
    // direction arms), so an un-checkpointed caller plan would execute
    // twice; sym and the initial labels stay EAGER because each has two
    // consumers whose stages AQE schedules concurrently, and a LAZY
    // checkpoint consumed by two concurrent stages is recomputed in
    // both before the cache fills (measured: lazy-everything ran q195
    // 1.9x SLOWER). Only the per-round `next` is lazy: its first
    // consumer is the convergence aggregate below — a single action
    // that materializes it in the same job, halving the per-round job
    // count.
    // sym is hash-partitioned on dst BEFORE the checkpoint: every
    // round's propagation join keys on sym.dst, and a LogicalRDD
    // checkpoint preserves its child's output partitioning — so the
    // per-round plan reads sym's cached partitions directly instead of
    // re-shuffling it each round (guide §2.4: establish the partitioning
    // once; one extra exchange here replaces one per round).
    val sym = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(
        e0.sparkSession.sparkContext.defaultParallelism, col("dst"))
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
      val m = labels.select(col("id"), col("component"))
        .unionByName(viaEdges)
        .groupBy("id").agg(min("component").as("component"))
      // POINTER JUMP (r11): comp(v) ← comp(comp(v)). Plain one-hop
      // propagation needs O(diameter) rounds, and the synthetic corpus
      // builds LONG CHAINS of consecutive-id near-dups — at sf0.1 the
      // q195/cluster-map graphs were still propagating when the old loop
      // hit maxIter (label sums decreasing at round 20), i.e. every CC
      // consumer's bench-scale output was silently truncated while the
      // oracle's WITH RECURSIVE closure runs to the true fixpoint (the
      // small-SF gates converge under 20 rounds, which is why
      // CORRECTNESS stayed green). Jumping makes rounds O(log diameter)
      // — maxIter 20 now covers diameters ~2^20 — so the loop actually
      // CONVERGES at every scale, to the identical fixpoint: label
      // values are always ids of same-component vertices, each step is
      // a min over same-component labels (monotone, bounded below by
      // the component min), and a combined-operator fixpoint forces
      // comp constant per component = min id. Cost shape: m's aggregate
      // appears on both sides of the jump join inside ONE action, so
      // its shuffle is computed once and reused (ReusedExchange — the
      // right side is already hash(id)-partitioned by the aggregate,
      // only the left adds an exchange on component); still one job per
      // round. The left join + coalesce is totality armor (every
      // component value IS an id in m — labels only ever hold touched
      // ids — but a dropped row would be silent, a null is not).
      val next = m
        .join(m.select(col("id").as("cid"), col("component").as("jmp")),
          col("component") === col("cid"), "left")
        .select(col("id"),
          coalesce(col("jmp"), col("component")).as("component"))
        .localCheckpoint(false) // materialized by the sum action below
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
