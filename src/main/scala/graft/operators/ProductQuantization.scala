package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN — the memory-bound scale path.
  *
  * IVF/LSH (q41/q42) shrink the CANDIDATE set; PQ shrinks the VECTORS:
  * each 64-float embedding is encoded as M=8 one-byte codes (per-subspace
  * argmax against a 16-entry codebook), a 32× compression that lets a
  * 1000-executor cluster hold a trillion-vector index in memory. Search
  * is asymmetric distance computation (ADC): per query, ONE M×K table of
  * subspace dot products is computed up front (here: on the broadcast
  * query side, before the join), and each candidate scores with M table
  * lookups — no float vector is touched at probe time.
  *
  * Codebooks are deterministic md5-derived halves (hexdigit − 7.5 —
  * exactly representable, same construction as the LSH planes), so
  * encode, table and scores are bit-identical in the DuckDB oracle.
  * Trained codebooks would come from per-subspace [[KMeans]]; the
  * fixed-contract set keeps the oracle closed-form, exactly as q42 does
  * for IVF centroids.
  */
object ProductQuantization {

  private val dim = 64
  private val nSub = 8 // subspaces
  private val subDim = dim / nSub
  private val nCodes = 16 // codebook entries per subspace
  private val nQueries = 5
  private val topK = 10

  /** codebook(m)(k)(d) = hexval(md5("pq<m>:<k>:<d>")[0]) − 7.5. */
  private[operators] val codebook: Array[Array[Array[Double]]] =
    Array.tabulate(nSub, nCodes, subDim) { (m, k, d) =>
      Integer.parseInt(Similarity.md5hex(s"pq$m:$k:$d").substring(0, 1), 16) - 7.5
    }

  private def cbSpark(m: Int, k: Int): String =
    codebook(m)(k).map(w => s"${w}D").mkString("array(", ", ", ")")
  private def cbDuck(m: Int, k: Int): String =
    codebook(m)(k).mkString("[", ", ", "]")

  private def dotDuck(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"

  /** Slice of an embedding column for subspace m (1-based offsets). */
  private def subSpark(col: String, m: Int): String =
    s"slice($col, ${m * subDim + 1}, $subDim)"
  private def subDuck(col: String, m: Int): String =
    s"list_slice($col, ${m * subDim + 1}, ${(m + 1) * subDim})"

  /** code_m = 1-based argmax_k dot(sub_m(v), codebook[m][k]) (first on
    * ties) — map-only encode, one tinyint per subspace in production.
    */
  private def codeSpark(col: String, m: Int): String = {
    val ds = (0 until nCodes)
      .map(k => Dedup.dot(subSpark(col, m), cbSpark(m, k)))
      .mkString("array(", ", ", ")")
    s"array_position($ds, array_max($ds))"
  }
  private def codeDuck(col: String, m: Int): String = {
    val ds = (0 until nCodes)
      .map(k => dotDuck(subDuck(col, m), cbDuck(m, k)))
      .mkString("[", ", ", "]")
    s"cast(list_position($ds, list_max($ds)) as bigint)"
  }

  /** Per-query ADC table for subspace m: dots of the query slice against
    * all K codebook entries — computed once per query, before the join.
    */
  private def tableSpark(col: String, m: Int): String =
    (0 until nCodes)
      .map(k => Dedup.dot(subSpark(col, m), cbSpark(m, k)))
      .mkString("array(", ", ", ")")
  private def tableDuck(col: String, m: Int): String =
    (0 until nCodes)
      .map(k => dotDuck(subDuck(col, m), cbDuck(m, k)))
      .mkString("[", ", ", "]")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Encode every vector (map-only), broadcast the queries WITH their
    // ADC tables, score candidates by M table lookups, rank top-k.
    "q48_pq_ann" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val e = Synth.embeddings(s, dir)
      val encoded = (0 until nSub).foldLeft(e.select(col("vec_id"), col("embedding"))) {
        (df, m) => df.withColumn(s"code$m", expr(codeSpark("embedding", m)))
      }.drop("embedding")
      val q = (0 until nSub).foldLeft(
          e.filter(col("vec_id") < nQueries)
            .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))) {
        (df, m) => df.withColumn(s"tab$m", expr(tableSpark("q_emb", m)))
      }.drop("q_emb")
      val score = (0 until nSub)
        .map(m => s"element_at(tab$m, cast(code$m as int))")
        .reduce((a, b) => s"($a + $b)")
      val w = Window.partitionBy("query_id")
        .orderBy(col("pq_score").desc, col("vec_id"))
      broadcast(q).crossJoin(encoded)
        .withColumn("pq_score", expr(score))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= topK)
        .select("query_id", "rk", "vec_id", "pq_score")
        .orderBy("query_id", "rk")
    },

    // IVF + PQ — the trillion-vector index layout: IVF clusters prune
    // the candidate set to ~n/k (the cluster id doubles as partition
    // key), PQ codes score the survivors by table lookup. The probe
    // touches one cluster's codes per query and never a float vector:
    // candidate count AND bytes-per-candidate both shrink. Ranking is
    // the bounded-heap aggregate, so only k rows per query shuffle.
    "q48b_ivf_pq" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val e = Synth.embeddings(s, dir)
      val encoded = (0 until nSub).foldLeft(
          e.select(col("vec_id"), col("embedding"))
            .withColumn("cluster", expr(Similarity.clusterExprSpark("embedding")))) {
        (df, m) => df.withColumn(s"code$m", expr(codeSpark("embedding", m)))
      }.drop("embedding")
      val q = (0 until nSub).foldLeft(
          e.filter(col("vec_id") < nQueries)
            .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
              expr(Similarity.clusterExprSpark("embedding")).as("cluster"))) {
        (df, m) => df.withColumn(s"tab$m", expr(tableSpark("q_emb", m)))
      }.drop("q_emb")
      val score = (0 until nSub)
        .map(m => s"element_at(tab$m, cast(code$m as int))")
        .reduce((a, b) => s"($a + $b)")
      broadcast(q).join(encoded, "cluster")
        .withColumn("pq_score", expr(score))
        .groupBy("query_id")
        .agg(expr(s"graft_topk(pq_score, vec_id, $topK)").as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rk"),
          col("col.id").as("vec_id"), col("col.score").as("pq_score"))
        .orderBy("query_id", "rk")
    }
  )

  def oracle: Map[String, String] = Map(
    "q48_pq_ann" -> {
      val codeCols = (0 until nSub)
        .map(m => s"${codeDuck("embedding", m)} AS code$m").mkString(",\n  ")
      val tabCols = (0 until nSub)
        .map(m => s"${tableDuck("embedding", m)} AS tab$m").mkString(",\n  ")
      val score = (0 until nSub)
        .map(m => s"q.tab$m[cast(e.code$m as int)]")
        .reduce((a, b) => s"($a + $b)")
      s"""WITH enc AS (
         | SELECT vec_id, $codeCols FROM embeddings),
         |qt AS (
         | SELECT vec_id AS query_id, $tabCols
         | FROM embeddings WHERE vec_id < $nQueries)
         |SELECT query_id, rk, vec_id, pq_score FROM (
         | SELECT q.query_id AS query_id, e.vec_id AS vec_id,
         |  $score AS pq_score,
         |  cast(row_number() OVER (PARTITION BY q.query_id
         |    ORDER BY $score DESC, e.vec_id) as int) AS rk
         | FROM qt q CROSS JOIN enc e)
         |WHERE rk <= $topK ORDER BY query_id, rk""".stripMargin
    },

    "q48b_ivf_pq" -> {
      val codeCols = (0 until nSub)
        .map(m => s"${codeDuck("embedding", m)} AS code$m").mkString(",\n  ")
      val tabCols = (0 until nSub)
        .map(m => s"${tableDuck("embedding", m)} AS tab$m").mkString(",\n  ")
      val score = (0 until nSub)
        .map(m => s"q.tab$m[cast(e.code$m as int)]")
        .reduce((a, b) => s"($a + $b)")
      s"""WITH enc AS (
         | SELECT vec_id, ${Similarity.clusterExprDuck("embedding")} AS cluster,
         |  $codeCols FROM embeddings),
         |qt AS (
         | SELECT vec_id AS query_id,
         |  ${Similarity.clusterExprDuck("embedding")} AS cluster, $tabCols
         | FROM embeddings WHERE vec_id < $nQueries)
         |SELECT query_id, rk, vec_id, pq_score FROM (
         | SELECT q.query_id AS query_id, e.vec_id AS vec_id,
         |  $score AS pq_score,
         |  cast(row_number() OVER (PARTITION BY q.query_id
         |    ORDER BY $score DESC, e.vec_id) as int) AS rk
         | FROM qt q JOIN enc e ON q.cluster = e.cluster)
         |WHERE rk <= $topK ORDER BY query_id, rk""".stripMargin
    }
  )
}
