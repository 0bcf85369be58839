package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the graph-density
  * primitive behind community mining and spam/bot subgraph detection
  * over co-occurrence graphs (the same part co-purchase graph q68's
  * triangle count runs on).
  *
  * The k-core is the maximal subgraph where every vertex keeps degree
  * ≥ k. The distributed algorithm is the textbook peel: each round
  * computes degrees (one shuffle over the CURRENT edge set), drops
  * vertices below k, and restricts edges to surviving endpoints (two
  * semi-joins). The edge set only shrinks, so per-round cost falls
  * monotonically; at 100 TB each round is bounded by the surviving
  * |edges| shuffle, never revisits the raw log (the co-purchase edges
  * are compacted once, up front), and per-round driver traffic is zero
  * — rounds are FIXED at [[Rounds]], not probed, so the loop plans
  * eagerly with one localCheckpoint per round to cut lineage (the
  * PageRank/CC loop pattern).
  *
  * Fixed rounds instead of a convergence probe keeps the result a pure
  * function of (graph, k, R) that the DuckDB oracle replays as R
  * unrolled CTE rounds — bit-identical whether or not the peel has
  * reached its fixpoint. k = 80 on this graph cascades for 4 rounds and
  * is at fixpoint by round 5 at both sf0.01 and sf0.1 (measured), so
  * R = 6 returns the true 80-core here while the unrolled oracle stays
  * exact even at scale factors where it wouldn't be.
  */
object GraphCore {

  private val K = 80
  private val Rounds = 6

  /** The distinct co-purchase edge list (pa < pb, parts sharing an
    * order) — the graph q68's triangles, q143's k-core, and any future
    * co-purchase analysis all traverse. Its compaction (lineitem
    * self-join + distinct) is ~3 s at sf0.1 and is a pure corpus
    * artifact, so it is materialized ONCE per corpus content
    * ([[CorpusKey]] naming — collision/staleness-proof) and read in
    * place by every consumer; the bench warms it with the other memo
    * tables. This is the literal realization of the scaladoc contract
    * "the co-purchase edges are compacted once, up front".
    */
  private val edgeLock = new Object
  private[operators] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val table = CorpusKey.tableName(s, "graft_copurchase_edges", dir)
    edgeLock.synchronized {
      if (!s.catalog.tableExists(table)) {
        CorpusKey.prepareBuild(s, table)
        val li = Synth.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        li.toDF("ok", "pa")
          .join(li.toDF("ok", "pb").hint("shuffle_hash"), "ok")
          .filter(col("pa") < col("pb"))
          .select("pa", "pb").distinct()
          .write.mode("overwrite").saveAsTable(table)
      }
    }
    s.table(table).select("pa", "pb")
  }

  /** Bench warmup hook — see [[Dedup.warmArtifacts]]. */
  private[graft] def warmArtifacts(s: SparkSession, dir: String): Unit = {
    coPurchaseEdges(s, dir); ()
  }

  /** Peel `edges` (undirected, one (pa < pb) row per edge) for `rounds`
    * rounds at threshold `k`; returns the surviving (node, deg) table.
    *
    * KEEP-SET loop (the r6 punch item — the old form paid three
    * edge-set shuffles AND an edge-set checkpoint per round). The peel
    * is monotone: keep sets only shrink, so the round-r edge set is
    * e0 restricted to keep_r — it never has to be built from the
    * previous round's edges. Each round therefore (1) counts degrees
    * over the SYMMETRIC base edge set filtered by the previous keep
    * (two semi-joins that AQE turns into broadcasts while the keep set
    * is small — at web scale it degrades gracefully to shuffle
    * semi-joins), and (2) checkpoints only the new KEEP SET — a
    * vertex-sized frame — keeping lineage depth constant. The edge set
    * is checkpointed exactly once, up front; per-round shuffle traffic
    * is one degree aggregation (map-side combinable), and per-round
    * driver traffic is zero. Every node's row count in the symmetric
    * set IS its degree, so the final aggregate is unchanged —
    * bit-identical to the r6 sequential-restriction form (the oracle's
    * unrolled CTE rounds prove it).
    */
  def peel(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e0 = edges0.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(edges0.select(col("pb").as("src"), col("pa").as("dst")))
      .localCheckpoint()
    var cur = e0
    // NO fixpoint early-exit (measured r11): keep sets are monotone, so
    // an equal-count round would let the loop stop with a bit-identical
    // result — but at sf0.1 the co-purchase keep counts are
    // 19154/18957/18893/18869/18863/18863: convergence lands exactly ON
    // the final round, so the exit saves zero rounds while its per-round
    // count() adds a job (A/B benched flat-to-worse, 2.84 → 2.91 min).
    for (_ <- 1 to rounds) {
      val keep = cur.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
        .localCheckpoint() // tiny (vertex-sized); read by both semi-joins
      cur = e0.join(keep, Seq("src"), "left_semi")
        .select(col("dst").as("src"), col("src").as("dst"))
        .join(keep, Seq("src"), "left_semi")
    }
    cur.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_kcore" -> { (s, dir) =>
      peel(coPurchaseEdges(s, dir), K, Rounds).orderBy("node")
    },

    // Butterfly (bipartite 4-cycle) census over the order–part graph —
    // THE cohesion statistic for bipartite data (Sanei-Mehri et al.
    // 2018), where triangles don't exist by construction: a butterfly is
    // two orders sharing two parts. Never enumerated 4 ways: wedges
    // Σ_p C(df_p, 2) come from one degree pass; butterflies
    // Σ_{order pairs} C(shared, 2) from the part-keyed wedge join +
    // per-pair count — cost is Σ_p C(df_p, 2), the same inverted-index
    // bound as q31. The hub-cap guard is CODE, not prose (r6 punch):
    // see [[butterflyStats]].
    "q152_butterflies" -> { (s, dir) =>
      butterflyStats(Synth.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct(), PartDfCap)
    },

    // Association rules over the order–part baskets — the market-basket
    // statistic (support / confidence / lift) that turns q152's pair
    // counts into directional "bought X ⇒ buys Y" rules: pair support
    // from the same order-keyed wedge join (min-support floor applied
    // BEFORE anything fans out — the a-priori prune), each surviving
    // pair emits both directions, singleton supports and the order
    // count join in (item side broadcastable — it's vocabulary-sized).
    // All counts exact bigints; confidence and lift are fixed-order
    // divides of exact integer products, so even the top-20-by-lift cut
    // is deterministic (lift DESC, x, y is a total order). Mega-basket
    // cap: see [[associationRules]].
    "q160_association_rules" -> { (s, dir) =>
      associationRules(Synth.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct(), minSupp = 3, basketCap = BasketCap)
    },

    // A-priori frequent TRIPLES — the level-3 itemset pass above q160's
    // pairs, over the same per-ORDER baskets (pooling baskets per
    // customer was measured 5-10× heavier for the same statistic —
    // C(40,2) vs C(7,2) instances per basket — with no new operator
    // semantics). DISTINCT from q134: q134 mines word triples over
    // document presence with a TOP-K VOCABULARY cut (the dense-matrix
    // regime — a tiny hot vocabulary where every pair is frequent and
    // gates buy nothing); this query mines sparse transaction baskets
    // where the lossless min-support gates below ARE the algorithm. The a-priori monotonicity (support(abc) ≤ support of
    // every sub-pair) is applied as LOSSLESS semi-join gates: the
    // (a, b) gate fires BEFORE the c fan-out (the basket expansion only
    // extends frequent pairs) and the (b, c)/(a, c) gates prune before
    // the count — gated counts are exact because a triple's instances
    // pass or fail gates identically, and any gated-out triple was
    // below min-support anyway. That ordering is the whole scale story:
    // ungated triple enumeration is Σ C(basket, 3), gated it is
    // (frequent-pair instances) × basket tail — orders of magnitude
    // less on any corpus whose frequent set is sparse. Exact integer
    // supports, deterministic top-20 by (support DESC, a, b, c).
    "q177_apriori_triples" -> { (s, dir) =>
      val minSupp = 2
      // baskets as SORTED ARRAYS, checkpointed once: pair and triple
      // instances then come from map-side array explodes (exactly
      // C(|basket|, 2) and gated-pair × suffix rows — no shuffle join
      // ever touches the instance streams)
      val baskets = Synth.lineitem(s, dir)
        .select(col("l_orderkey").as("ck"), col("l_partkey").as("pk"))
        .groupBy("ck").agg(sort_array(collect_set(col("pk"))).as("ps"))
        .localCheckpoint()
      // ordered pair instances (a < b by array order): posexplode + the
      // tail slice — C(|ps|, 2) rows exactly, all map-side
      def pairInstances = baskets
        .select(col("ck"), col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
        .select(col("ck"), col("ps"), col("a"),
          explode(expr("slice(ps, i + 2, size(ps))")).as("b"))
      val f2 = pairInstances
        .groupBy("a", "b").agg(count(lit(1)).as("s_ab"))
        .filter(col("s_ab") >= minSupp)
        .select("a", "b").localCheckpoint() // read by all three gates
      // the gates BROADCAST: a frequent-pair table is min-support-bounded
      // (a tiny fraction of the pair space by construction), and the
      // checkpointed frame carries no stats for AQE to see — without the
      // hint each gate shuffles the full instance stream
      pairInstances
        .join(broadcast(f2), Seq("a", "b"), "left_semi") // gate BEFORE the c fan-out
        .select(col("a"), col("b"), explode(expr(
          "slice(ps, cast(array_position(ps, b) as int) + 1, size(ps))"))
          .as("c"))
        .join(broadcast(f2.toDF("b", "c")), Seq("b", "c"), "left_semi")
        .join(broadcast(f2.toDF("a", "c")), Seq("a", "c"), "left_semi")
        .groupBy("a", "b", "c").agg(count(lit(1)).as("s_abc"))
        .filter(col("s_abc") >= minSupp)
        .orderBy(col("s_abc").desc, col("a"), col("b"), col("c"))
        .limit(20)
    }
  )

  /** q152's part-df hub cap and q160's basket-size hub cap. Both joins
    * are Σ C(key-degree, 2) pair spaces; one web-scale hub key (a part
    * in millions of orders / a crawler basket with millions of items)
    * would dominate the whole job. TPC-H dfs sit orders of magnitude
    * below both caps (part df ≈ 30, basket size ≤ 7 at every SF), so
    * the capped queries are bit-identical to the uncapped form there —
    * HubCapSpec exercises a synthetic hub above the cap.
    */
  private[operators] val PartDfCap = 4096
  private[operators] val BasketCap = 512

  /** Butterfly census with the hub cap applied to the PAIR enumeration
    * only: a part with df > cap is excluded from the order-pair join
    * (its C(df, 2) wedge fan-out is the quadratic hazard), but its
    * wedge COUNT — the denominator — needs only its df, which the
    * degree pass computes exactly for every part, hubs included. The
    * pair-side statistics over a capped corpus are the standard
    * hub-sampled estimator regime (Sanei-Mehri et al. treat hub wedges
    * by sampling for exactly this reason); on corpora with no over-cap
    * key the output is exact and unchanged.
    */
  private[graft] def butterflyStats(op0: DataFrame, dfCap: Int): DataFrame = {
    // the compacted (ok, pk) incidence list is read by the degree pass
    // and BOTH wedge-join sides (through opLow) — without the checkpoint
    // the upstream distinct's shuffle re-executes once per consumer
    // (r11, measured A/B)
    val op = op0.localCheckpoint()
    val dfs = op.groupBy("pk").agg(count(lit(1)).as("df"))
    val wedges = dfs.agg(sum(expr("df * (df - 1) div 2")).as("n_wedges"))
    // explicit select: a USING join reorders columns (join key first),
    // and the toDF renames below are positional
    val opLow = op.join(dfs.filter(col("df") <= dfCap).select("pk"),
      Seq("pk"), "left_semi")
      .select("ok", "pk")
    val bf = opLow.toDF("oa", "pk")
      .join(opLow.toDF("ob", "pk").hint("shuffle_hash"), "pk")
      .filter(col("oa") < col("ob"))
      .groupBy("oa", "ob").agg(count(lit(1)).as("shared"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("shared * (shared - 1) div 2")).as("n_butterflies"))
    bf.crossJoin(broadcast(wedges))
      .withColumn("butterflies_per_wedge",
        col("n_butterflies").cast("double") / col("n_wedges").cast("double"))
      .select("n_wedges", "n_pairs", "n_butterflies", "butterflies_per_wedge")
  }

  /** Association rules with the mega-basket cap applied to PAIR
    * GENERATION only; singleton supports and the order count stay
    * exact over the full corpus. The cap is CONSERVATIVE for rule
    * existence — provably: dropping a basket from the pair join can
    * only LOWER s_ab (s_x, s_y, n are untouched), so every rule the
    * capped run emits has true support ≥ its reported s_ab ≥ minSupp —
    * a capped basket can never make a min-support rule appear that the
    * uncapped run wouldn't also emit; it can only hide rules whose
    * support lives inside mega-baskets (which a-priori mining discounts
    * anyway: a basket with thousands of items evidences co-location,
    * not co-purchase intent).
    */
  private[graft] def associationRules(op0: DataFrame, minSupp: Int,
      basketCap: Int): DataFrame = {
    // (ok, pk) is read 5× (order count, singleton supports, basket-size
    // filter, both pair-join sides) — checkpoint once (r11, measured A/B)
    val op = op0.localCheckpoint()
    val n = op.agg(countDistinct(col("ok")).as("n_orders"))
    val supp = op.groupBy("pk").agg(count(lit(1)).as("s"))
    val okLow = op.groupBy("ok").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= basketCap).select("ok")
    val opPairs = op.join(okLow, Seq("ok"), "left_semi")
      .select("ok", "pk") // positional safety for the toDF renames below
    val pairSupp = opPairs.toDF("ok", "a")
      .join(opPairs.toDF("ok", "b").hint("shuffle_hash"), "ok")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s_ab"))
      .filter(col("s_ab") >= minSupp)
    pairSupp.select(col("a").as("x"), col("b").as("y"), col("s_ab"))
      .unionAll(pairSupp.select(col("b").as("x"), col("a").as("y"),
        col("s_ab")))
      .join(supp.toDF("x", "s_x"), "x")
      .join(supp.toDF("y", "s_y"), "y")
      .crossJoin(broadcast(n))
      .withColumn("confidence",
        expr("cast(s_ab as double) / cast(s_x as double)"))
      .withColumn("lift",
        expr("cast(n_orders * s_ab as double) / cast(s_x * s_y as double)"))
      .select("x", "y", "s_ab", "s_x", "s_y", "confidence", "lift")
      .orderBy(col("lift").desc, col("x"), col("y"))
      .limit(20)
  }

  def oracle: Map[String, String] = {
    // the same R peel rounds, unrolled as CTE pairs (k_i = survivors of
    // round i's degree filter, e_i = edges restricted to them)
    // MATERIALIZED is load-bearing: each round reads the previous round's
    // edge set three times (two degree legs + the restriction), and
    // DuckDB inlines plain CTEs — 6 rounds would expand 3⁶ scans of the
    // base join and exhaust file handles.
    val rounds = (1 to Rounds).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT v FROM (
         |    SELECT v, count(*) AS deg FROM (
         |      SELECT pa AS v FROM e${i - 1}
         |      UNION ALL SELECT pb FROM e${i - 1}) GROUP BY v)
         |  WHERE deg >= $K),
         |e$i AS MATERIALIZED (
         |  SELECT pa, pb FROM e${i - 1}
         |  WHERE pa IN (SELECT v FROM k$i) AND pb IN (SELECT v FROM k$i))""".stripMargin
    }.mkString(",\n")
    Map(
      "q143_kcore" ->
        s"""WITH e0 AS MATERIALIZED (
           |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |$rounds
           |SELECT node, cast(count(*) as bigint) AS deg FROM (
           |  SELECT pa AS node FROM e$Rounds
           |  UNION ALL SELECT pb FROM e$Rounds)
           |GROUP BY node ORDER BY node""".stripMargin,

      "q152_butterflies" ->
        """WITH op AS (
          |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |w AS (
          |  SELECT cast(sum(df * (df - 1) // 2) as bigint) AS n_wedges
          |  FROM (SELECT pk, count(*) AS df FROM op GROUP BY pk)),
          |sh AS (
          |  SELECT a.ok AS oa, b.ok AS ob, count(*) AS shared
          |  FROM op a JOIN op b ON a.pk = b.pk AND a.ok < b.ok
          |  GROUP BY 1, 2),
          |bf AS (
          |  SELECT cast(count(*) as bigint) AS n_pairs,
          |    cast(sum(shared * (shared - 1) // 2) as bigint) AS n_butterflies
          |  FROM sh)
          |SELECT n_wedges, n_pairs, n_butterflies,
          |  cast(n_butterflies as double) / cast(n_wedges as double)
          |    AS butterflies_per_wedge
          |FROM bf, w""".stripMargin,

      "q160_association_rules" ->
        """WITH op AS (
          |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |n AS (SELECT count(DISTINCT ok) AS n_orders FROM op),
          |supp AS (SELECT pk, count(*) AS s FROM op GROUP BY pk),
          |ps AS (
          |  SELECT a.pk AS a, b.pk AS b, count(*) AS s_ab
          |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
          |  GROUP BY 1, 2 HAVING count(*) >= 3),
          |rules AS (
          |  SELECT a AS x, b AS y, s_ab FROM ps
          |  UNION ALL SELECT b, a, s_ab FROM ps)
          |SELECT x, y, s_ab, sx.s AS s_x, sy.s AS s_y,
          |  cast(s_ab as double) / cast(sx.s as double) AS confidence,
          |  cast((SELECT n_orders FROM n) * s_ab as double)
          |    / cast(sx.s * sy.s as double) AS lift
          |FROM rules
          |  JOIN supp sx ON sx.pk = rules.x
          |  JOIN supp sy ON sy.pk = rules.y
          |ORDER BY lift DESC, x, y LIMIT 20""".stripMargin,

      // ungated 3-way basket join + HAVING — the gates are lossless, so
      // the declarative form is the same set
      "q177_apriori_triples" ->
        """WITH ob AS (
          |  SELECT DISTINCT l_orderkey AS ck, l_partkey AS pk FROM lineitem)
          |SELECT a.pk AS a, b.pk AS b, c.pk AS c,
          |  cast(count(*) as bigint) AS s_abc
          |FROM ob a
          |  JOIN ob b ON b.ck = a.ck AND a.pk < b.pk
          |  JOIN ob c ON c.ck = b.ck AND b.pk < c.pk
          |GROUP BY 1, 2, 3 HAVING count(*) >= 2
          |ORDER BY s_abc DESC, a, b, c LIMIT 20""".stripMargin
    )
  }
}
