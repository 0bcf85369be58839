package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04): rank words
  * by PageRank over the word co-occurrence graph, instead of by raw
  * frequency (q24) or tf-idf (q38) — a word matters if it co-occurs
  * with other words that matter.
  *
  * Composition, not new machinery: the co-occurrence pairs are q110's
  * ±2-token skip-gram multiset, the ranking loop is [[PageRank]]'s
  * fixed-point integer iteration (bigint micro-units, bit-identical
  * across engines and partitionings). The pair counts become SYMMETRIC
  * weighted edges (TextRank's graph is undirected — each unordered pair
  * feeds both directions), compacted once before iterating.
  *
  * Scale shape at 100 TB: the pair explode is narrow (≤ 2 rows/token),
  * one shuffle counts edges, and after the `c_ab ≥ 3` head cut the
  * graph is vocabulary-sized — iteration cost is |edges|-bounded joins
  * over that compacted graph, never re-touching the corpus. The corpus
  * is read exactly once.
  */
object TextRank {

  private val nIters = 3
  private val minEdge = 3
  private val topN = 25
  private val bfsRounds = 3

  /** The symmetric weighted word graph shared by q119 (TextRank), q121
    * (label propagation), q132 (link prediction), q136/q158 (BFS), and
    * q164 (modularity): q110's ±2-window unordered pair multiset,
    * self-pairs dropped, compacted to counts, `c_ab ≥ minEdge` head
    * cut, then both directions emitted. Returns (vertices(id), weighted
    * edges(src, dst, cnt)).
    *
    * The COMPACTED pair table (a, b, c_ab) is a corpus artifact six
    * queries re-derived from scratch (the corpus-sized pair explode +
    * count shuffle, ~1 s each at sf0.1), so it is memoized once per
    * corpus content ([[CorpusKey]]) like the co-purchase edge list and
    * the cluster map; the symmetric wedge view and the vertex set
    * derive map-side from the table scan.
    */
  private val graphLock = new Object
  private def coTable(s: SparkSession, dir: String): DataFrame = {
    val table = CorpusKey.tableName(s, "graft_word_cooc", dir)
    graphLock.synchronized {
      if (!s.catalog.tableExists(table)) {
        CorpusKey.prepareBuild(s, table)
        val t = Synth.documents(s, dir)
          .select(col("doc_id"), expr(TextAnalysis.toks).as("t"))
        t.filter(expr("size(t) >= 2"))
          .select(explode(expr(
            "flatten(transform(sequence(1, size(t) - 1), " +
              "i -> transform(sequence(i + 1, least(i + 2, size(t))), " +
              "j -> struct(least(element_at(t, i), element_at(t, j)) AS a, " +
              "greatest(element_at(t, i), element_at(t, j)) AS b))))")).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .filter(col("a") =!= col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= minEdge)
          .write.mode("overwrite").saveAsTable(table)
      }
    }
    s.table(table).select("a", "b", "c_ab")
  }

  /** Bench warmup hook — see [[graft.operators.Dedup.warmArtifacts]]. */
  private[graft] def warmArtifacts(s: SparkSession, dir: String): Unit = {
    coTable(s, dir); ()
  }

  private[operators] def wordGraph(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val co = coTable(s, dir)
    val wedges = co.select(col("a").as("src"), col("b").as("dst"),
        col("c_ab").as("cnt"))
      .unionAll(co.select(col("b").as("src"), col("a").as("dst"),
        col("c_ab").as("cnt")))
    val verts = wedges.select(col("src").as("id")).distinct()
    (verts, wedges)
  }

  /** DuckDB rendering of [[wordGraph]] — CTEs `t, idx, pairs, co,
    * wedges, verts`, shared by the q119/q121 oracles.
    */
  private[operators] val duckGraphCtes: String =
    s"""t AS (SELECT doc_id, ${TextAnalysis.dToks} AS t FROM documents),
       |idx AS (
       | SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
       | FROM t WHERE len(t) >= 2),
       |pairs AS (
       | SELECT least(t[i], t[i+1]) AS a, greatest(t[i], t[i+1]) AS b
       | FROM idx
       | UNION ALL
       | SELECT least(t[i], t[i+2]), greatest(t[i], t[i+2])
       | FROM idx WHERE i + 2 <= len(t)),
       |co AS (
       | SELECT a, b, count(*) AS c_ab FROM pairs
       | WHERE a <> b GROUP BY a, b HAVING count(*) >= $minEdge),
       |wedges AS (
       | SELECT a AS src, b AS dst, c_ab AS cnt FROM co
       | UNION ALL
       | SELECT b, a, c_ab FROM co),
       |verts AS (SELECT DISTINCT src AS id FROM wedges)""".stripMargin

  /** The q158 mask-BFS engine: per-vertex ≤62-bit seed masks OR-folded
    * along directed edges for `rounds` rounds; returns (h, reached_pairs)
    * with reached_pairs(h) = Σ_v popcount(mask_v after h rounds) = the
    * number of (seed, vertex) pairs within h hops. `seeds` = (id, bit)
    * with bit ∈ [0, 62). Equivalence with per-seed BFS is oracle-proven
    * (q158) and property-tested on random graphs (PropertySpec).
    */
  private[graft] def multiSourceBfsCensus(
      verts: DataFrame, e: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    var masks = verts
      .join(seeds, Seq("id"), "left")
      .withColumn("mask", coalesce(expr("shiftleft(1L, bit)"), lit(0L)))
      .select("id", "mask").localCheckpoint()
    def census(h: Int, m: DataFrame) =
      m.agg(lit(h).as("h"),
        sum(expr("bit_count(mask)")).cast("long").as("reached_pairs"))
    var out = Vector(census(0, masks))
    for (k <- 1 to rounds) {
      val nbr = e.join(masks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(expr("bit_or(mask)").as("nm"))
      masks = masks.join(nbr, Seq("id"), "left")
        .withColumn("mask", expr("mask | coalesce(nm, 0L)"))
        .select("id", "mask").localCheckpoint()
      out :+= census(k, masks)
    }
    out.reduce(_ unionAll _)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q119_textrank" -> { (s, dir) =>
      val (verts, wedges) = wordGraph(s, dir)
      PageRank.runWeighted(verts, wedges, nIters)
        .orderBy(col("rank_fp").desc, col("id"))
        .limit(topN)
    },

    // BFS levels — frontier expansion from a deterministic source (the
    // lexicographically smallest vertex), the traversal primitive under
    // shortest-paths / reachability / influence-radius queries. Each
    // round is ONE |edges|-bounded join (frontier → neighbors) + an
    // anti-join against the assigned set — never touches non-frontier
    // vertices; `localCheckpoint` per round keeps plans flat (the
    // PageRank/CC loop contract). Unreached-within-3-hops vertices are
    // simply absent, as a traversal leaves them.
    "q136_bfs_levels" -> { (s, dir) =>
      val (verts, wedges) = wordGraph(s, dir)
      val e = wedges.select("src", "dst").localCheckpoint()
      val src = broadcast(verts.agg(min(col("id")).as("src_id")))
      var levels = verts.join(src, col("id") === col("src_id"))
        .select(col("id"), lit(0).as("level")).localCheckpoint()
      for (k <- 1 to bfsRounds) {
        val frontier = levels.filter(col("level") === k - 1)
          .select(col("id").as("src"))
        val next = e.join(frontier, "src").select(col("dst").as("id"))
          .distinct()
          .join(levels, Seq("id"), "left_anti")
          .withColumn("level", lit(k))
        levels = levels.unionAll(next).localCheckpoint()
      }
      levels.orderBy("level", "id")
    },

    // Multi-source BFS reachability census — the neighborhood-function
    // N(h) estimator (the HyperANF/effective-diameter primitive) run
    // EXACTLY over 62 seeds: each vertex carries a 62-bit seed mask in
    // one bigint, a BFS round is one |edges|-bounded join + a per-vertex
    // bit_or (so 62 traversals cost ONE traversal's shuffles), and
    // N(h) = Σ_v popcount(mask_v) counts (seed, vertex) pairs within h
    // hops. 62 bits, not 64: bit 63 is the sign and bit 62 would make
    // shift semantics engine-dependent; production runs ⌈S/62⌉ mask
    // words. Seeds are the 62 lexicographically smallest vertices — the
    // only unpartitioned window runs over those 62 LIMITed rows (the
    // PrefixSum offsets argument). Integer masks ⇒ hash-exact.
    "q158_multisource_bfs" -> { (s, dir) =>
      val (verts, wedges) = wordGraph(s, dir)
      val e = wedges.select("src", "dst").localCheckpoint()
      val seeds = verts.orderBy("id").limit(62)
        .withColumn("bit",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy("id")) - 1)
      multiSourceBfsCensus(verts, e, seeds.select("id", "bit"), bfsRounds)
        .orderBy("h")
    },

    // Link prediction by common neighbors — related-term discovery over
    // the same word graph: word pairs that share many neighbors but are
    // NOT directly connected (the co-occurrence graph's missing edges
    // with the strongest structural evidence — distributional synonym
    // candidates).
    //
    // ORIENTED wedge enumeration (the r6 punch item): the naive form
    // joined the SYMMETRIC edge list to itself on the middle vertex — a
    // hub word of degree d streams d² ordered pairs (every wedge twice,
    // plus the discarded half), and word co-occurrence graphs are
    // exactly the power-law case. Here every edge is oriented low→high
    // in q68's (degree, id) total order and each wedge (a, mid, b) is
    // generated EXACTLY ONCE, routed by where its center sits in that
    // order: mid lowest → a pair of mid's out-neighbors (cfgA); mid
    // between → one in-edge × one out-edge (cfgB); mid highest → a pair
    // of in-neighbors (cfgC). The three configs partition the wedge set,
    // so summing their pair streams reproduces the exact common-neighbor
    // counts — the oracle and hash are unchanged. Out-degrees are
    // bounded at O(√m) by the orientation, so cfgA's fan-out is
    // O(√m)/edge and cfgB's is O(√m)/in-edge; cfgC (in-neighbor pairs at
    // the order-highest endpoint) is the one quadratic term left, and it
    // is OUTPUT-bounded: every pair it streams has cn ≥ 1 through that
    // hub and is emitted by the groupBy, the floor any exact
    // common-neighbor enumerator pays. Existing edges leave via a
    // left_anti join — never an all-pairs space.
    "q132_link_prediction" -> { (s, dir) =>
      val (_, wedges) = wordGraph(s, dir)
      // ONE corpus pass: the unique (u < v) edge list is checkpointed and
      // everything else (degrees, orientation, the anti side) derives
      // from it — without this the co-occurrence pair explode re-runs
      // for each consumer
      val eU = wedges.filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))
        .localCheckpoint()
      val deg = eU.select(col("u").as("x"))
        .unionAll(eU.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
      val loFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = eU
        .join(deg.toDF("u", "du"), "u")
        .join(deg.toDF("v", "dv"), "v")
        .select(
          when(loFirst, col("u")).otherwise(col("v")).as("lo"),
          when(loFirst, col("v")).otherwise(col("u")).as("hi"))
        .localCheckpoint() // feeds all three config joins + the anti side
      val cfgA = oriented.toDF("mid", "a")
        .join(oriented.toDF("mid", "b").hint("shuffle_hash"), "mid")
        .filter(col("a") < col("b"))
        .select("a", "b")
      val cfgB = oriented.toDF("x", "mid")
        .join(oriented.toDF("mid", "y").hint("shuffle_hash"), "mid")
        .select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"))
      val cfgC = oriented.toDF("a", "mid")
        .join(oriented.toDF("b", "mid").hint("shuffle_hash"), "mid")
        .filter(col("a") < col("b"))
        .select("a", "b")
      val cn = cfgA.unionAll(cfgB).unionAll(cfgC)
        .groupBy("a", "b").agg(count(lit(1)).as("common_neighbors"))
      cn.join(eU.toDF("a", "b"), Seq("a", "b"), "left_anti")
        .orderBy(col("common_neighbors").desc, col("a"), col("b"))
        .limit(topN)
    }
  )

  def oracle: Map[String, String] = {
    // PageRank's unrolled integer iterations, weighted-edge form:
    // contribution = (rank div deg) * cnt per compacted edge.
    val iterCtes = (1 to nIters).map { i =>
      s"""r$i AS (
         |  SELECT v.id,
         |    (SELECT base FROM consts)
         |      + coalesce(c.in_sum, 0) * 85 // 100 AS rank_fp
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst AS id,
         |      cast(sum((r.rank_fp // d.deg) * e.cnt) as bigint) AS in_sum
         |    FROM wedges e
         |      JOIN r${i - 1} r ON r.id = e.src
         |      JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) c ON c.id = v.id)""".stripMargin
    }.mkString(",\n")
    Map(
      "q119_textrank" ->
        s"""WITH $duckGraphCtes,
           |consts AS (
           |  SELECT ${PageRank.Scale} * 15 // 100 // count(*) AS base,
           |         ${PageRank.Scale} // count(*) AS r_init
           |  FROM verts),
           |deg AS (
           |  SELECT src, cast(sum(cnt) as bigint) AS deg
           |  FROM wedges GROUP BY src),
           |r0 AS (SELECT id, (SELECT r_init FROM consts) AS rank_fp FROM verts),
           |$iterCtes
           |SELECT id, cast(rank_fp as bigint) AS rank_fp
           |FROM r$nIters ORDER BY rank_fp DESC, id LIMIT $topN""".stripMargin,

      "q136_bfs_levels" -> {
        val roundCtes = (1 to bfsRounds).map { k =>
          s"""l$k AS (
             |  SELECT id, $k AS level FROM (
             |    SELECT DISTINCT e.dst AS id
             |    FROM wedges e JOIN l${k - 1} f ON f.id = e.src) n
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM a${k - 1} x WHERE x.id = n.id)),
             |a$k AS (SELECT id, level FROM a${k - 1}
             |  UNION ALL SELECT id, level FROM l$k)""".stripMargin
        }.mkString(",\n")
        s"""WITH $duckGraphCtes,
           |l0 AS (SELECT min(id) AS id, 0 AS level FROM verts),
           |a0 AS (SELECT id, level FROM l0),
           |$roundCtes
           |SELECT id, level FROM a$bfsRounds ORDER BY level, id""".stripMargin
      },

      "q158_multisource_bfs" -> {
        val roundCtes = (1 to bfsRounds).map { k =>
          s"""m$k AS MATERIALIZED (
             |  SELECT m.id, m.mask | coalesce(n.nm, 0) AS mask
             |  FROM m${k - 1} m LEFT JOIN (
             |    SELECT e.dst AS id, bit_or(mm.mask) AS nm
             |    FROM wedges e JOIN m${k - 1} mm ON mm.id = e.src
             |    GROUP BY e.dst) n ON n.id = m.id)""".stripMargin
        }.mkString(",\n")
        val censuses = (0 to bfsRounds).map { h =>
          s"SELECT $h AS h, cast(sum(bit_count(mask)) as bigint) " +
            s"AS reached_pairs FROM m$h"
        }.mkString("\nUNION ALL\n")
        s"""WITH $duckGraphCtes,
           |seeds AS (
           |  SELECT id, row_number() OVER (ORDER BY id) - 1 AS bit
           |  FROM (SELECT id FROM verts ORDER BY id LIMIT 62)),
           |m0 AS MATERIALIZED (
           |  SELECT v.id,
           |    coalesce(1::BIGINT << s.bit, 0)::BIGINT AS mask
           |  FROM verts v LEFT JOIN seeds s ON s.id = v.id),
           |$roundCtes
           |$censuses
           |ORDER BY h""".stripMargin
      },

      "q132_link_prediction" ->
        s"""WITH $duckGraphCtes,
           |wp AS (
           |  SELECT e1.dst AS a, e2.dst AS b
           |  FROM wedges e1 JOIN wedges e2 ON e1.src = e2.src
           |  WHERE e1.dst < e2.dst),
           |cn AS (
           |  SELECT a, b, count(*) AS common_neighbors
           |  FROM wp GROUP BY a, b)
           |SELECT a, b, common_neighbors FROM cn
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM wedges e WHERE e.src = cn.a AND e.dst = cn.b)
           |ORDER BY common_neighbors DESC, a, b LIMIT $topN""".stripMargin
    )
  }
}
