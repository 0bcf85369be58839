package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et
  * al. 2007) over [[TextRank.wordGraph]] — words that co-occur settle
  * on a shared label, and the label groups are topic clusters. The
  * cheap alternative to modularity optimization that runs in O(|E|)
  * per round.
  *
  * Textbook LPA is nondeterministic (sequential updates, random tie
  * breaks). This is the SYNCHRONOUS deterministic variant every
  * distributed engine actually ships: all vertices update from the
  * previous round's labels simultaneously, a vertex adopts the label
  * with the highest incident edge weight, and ties break to the
  * lexicographically smallest label — a pure function of the graph, so
  * the oracle replays it exactly.
  *
  * Scale shape (the [[PageRank]] loop contract): per round, ONE
  * |edges|-bounded join ships each neighbor's current label, one
  * shuffle sums weights per (vertex, label), and the per-vertex argmax
  * is a dense_rank-free window over each vertex's candidate labels
  * (≤ degree rows). `localCheckpoint` cuts lineage per round. Rounds
  * never touch the corpus — the graph is compacted once.
  */
object LabelProp {

  private val rounds = 2
  private val topN = 25

  /** One synchronous round: labels(id, lbl) → labels'(id, lbl). */
  private def step(wedges: DataFrame, labels: DataFrame): DataFrame = {
    val byVertex = Window.partitionBy("dst")
      .orderBy(col("wt").desc, col("lbl"))
    wedges
      .join(labels.withColumnRenamed("id", "src"), "src")
      .groupBy("dst", "lbl")
      .agg(sum(col("cnt")).as("wt"))
      .withColumn("rn", row_number().over(byVertex))
      .filter(col("rn") === 1)
      .select(col("dst").as("id"), col("lbl"))
      .localCheckpoint()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Two synchronous rounds from singleton labels, then the community
    // roll-up: (community label, member count), largest first.
    "q121_label_prop" -> { (s, dir) =>
      val (verts, wedges) = TextRank.wordGraph(s, dir)
      val w = wedges.localCheckpoint()
      val init = verts.withColumn("lbl", col("id"))
      val fin = (1 to rounds).foldLeft(init)((l, _) => step(w, l))
      fin.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("community"))
        .limit(topN)
    }
  )

  def oracle: Map[String, String] = {
    val roundCtes = (1 to rounds).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS id, l.lbl, cast(sum(e.cnt) as bigint) AS wt
         |  FROM wedges e JOIN l${i - 1} l ON l.id = e.src
         |  GROUP BY e.dst, l.lbl),
         |l$i AS (
         |  SELECT id, lbl FROM (
         |    SELECT id, lbl,
         |      row_number() OVER (PARTITION BY id
         |        ORDER BY wt DESC, lbl) AS rn
         |    FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    Map(
      "q121_label_prop" ->
        s"""WITH ${TextRank.duckGraphCtes},
           |l0 AS (SELECT id, id AS lbl FROM verts),
           |$roundCtes
           |SELECT lbl AS community, cast(count(*) as bigint) AS n_members
           |FROM l$rounds GROUP BY lbl
           |ORDER BY n_members DESC, community LIMIT $topN""".stripMargin
    )
  }
}
