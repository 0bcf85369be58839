package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - q40: brute-force cosine top-k — the exact baseline. The (small) query
  *    set is broadcast, so the scan side never shuffles: at 100 TB this is
  *    a map-only pass over the vectors.
  *  - q41: random-hyperplane LSH — each vector maps to an 8-bit bucket
  *    (sign of dot with 8 deterministic pseudo-random planes); search only
  *    probes the query's bucket. This is the scale path: bucket assignment
  *    is map-only and the candidate join touches ~n/256 of the data.
  *
  * Plane weights are md5-derived halves (hexdigit − 7.5), exactly
  * representable in binary floating point, so Spark and the DuckDB oracle
  * compute bit-identical dot products.
  */
object Similarity {

  private val nPlanes = 8
  private val dim = 64
  private val nQueries = 5
  private val topK = 10

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString

  /** weight(p, d) = hexval(md5("plane<p>:<d>")[0]) − 7.5 ∈ {−7.5 … 7.5}. */
  private[operators] val planes: Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      Integer.parseInt(md5hex(s"plane$p:$d").substring(0, 1), 16) - 7.5
    }

  private val nCentroids = 8

  /** IVF "centroids" for q42's fixed-contract oracle: deterministic
    * pseudo-vectors (same md5-derived halves construction as the LSH
    * planes, different salt). Real trained centroids are
    * [[KMeans.train]] (q43) — q42 keeps the pseudo set so its oracle
    * stays a closed-form expression.
    */
  private[operators] val centroids: Array[Array[Double]] =
    Array.tabulate(nCentroids, dim) { (c, d) =>
      Integer.parseInt(md5hex(s"centroid$c:$d").substring(0, 1), 16) - 7.5
    }

  private def centroidArraySpark(c: Int): String =
    centroids(c).map(w => s"${w}D").mkString("array(", ", ", ")")
  private def centroidArrayDuck(c: Int): String =
    centroids(c).mkString("[", ", ", "]")

  /** 1-based index of the max-dot centroid (first occurrence on ties). */
  private def clusterExprSpark(col: String): String = {
    val ds = (0 until nCentroids)
      .map(c => Dedup.dot(col, centroidArraySpark(c)))
      .mkString("array(", ", ", ")")
    s"array_position($ds, array_max($ds))"
  }
  private def clusterExprDuck(col: String): String = {
    val ds = (0 until nCentroids)
      .map(c => dotDuck(col, centroidArrayDuck(c)))
      .mkString("[", ", ", "]")
    s"cast(list_position($ds, list_max($ds)) as bigint)"
  }

  /** Render one plane as a SQL array literal (halves print exactly). */
  private def planeArraySpark(p: Int): String =
    planes(p).map(w => s"${w}D").mkString("array(", ", ", ")")
  private def planeArrayDuck(p: Int): String =
    planes(p).mkString("[", ", ", "]")

  /** 8-char '0'/'1' bucket string for an embedding column (Spark SQL). */
  private def bucketExprSpark(col: String): String =
    (0 until nPlanes)
      .map(p => s"if(${Dedup.dot(col, planeArraySpark(p))} > 0, '1', '0')")
      .mkString("concat(", ", ", ")")

  private def dotDuck(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"

  private def bucketExprDuck(col: String): String =
    (0 until nPlanes)
      .map(p => s"CASE WHEN ${dotDuck(col, planeArrayDuck(p))} > 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k: broadcast queries × all vectors.
    "q40_knn_brute" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val e = Synth.embeddings(s, dir)
      val q = e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("vec_id"))
      broadcast(q).crossJoin(e)
        .withColumn("cosine", expr(Dedup.dot("q_emb", "embedding")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= topK)
        .select("query_id", "rk", "vec_id", "cosine")
        .orderBy("query_id", "rk")
    },

    // LSH-bucketed ANN: assign every vector its hyperplane bucket
    // (map-only), then rank true cosine only inside the query's bucket.
    "q41_knn_lsh" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val e = Synth.embeddings(s, dir)
        .withColumn("bucket", expr(bucketExprSpark("embedding")))
      val q = e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("bucket"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("vec_id"))
      broadcast(q).join(e, "bucket")
        .withColumn("cosine", expr(Dedup.dot("q_emb", "embedding")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= topK)
        .select("query_id", "rk", "vec_id", "cosine")
        .orderBy("query_id", "rk")
    },

    // IVF-style ANN: assign every vector to its nearest pseudo-centroid
    // (map-only argmax over 8 dot products), then search only the query's
    // cluster. With real (trained) centroids this is the standard IVF
    // index shape: candidate set shrinks by ~n/k, assignment is a narrow
    // scan, and the cluster column doubles as the partitioning key for
    // co-located search at scale.
    "q42_knn_ivf" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val e = Synth.embeddings(s, dir)
        .withColumn("cluster", expr(clusterExprSpark("embedding")))
      val q = e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("cluster"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("vec_id"))
      broadcast(q).join(e, "cluster")
        .withColumn("cosine", expr(Dedup.dot("q_emb", "embedding")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= topK)
        .select("query_id", "rk", "vec_id", "cosine")
        .orderBy("query_id", "rk")
    }
  )

  def oracle: Map[String, String] = Map(
    "q40_knn_brute" ->
      s"""SELECT query_id, rk, vec_id, cosine FROM (
         | SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |  ${dotDuck("q.embedding", "e.embedding")} AS cosine,
         |  cast(row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY ${dotDuck("q.embedding", "e.embedding")} DESC, e.vec_id) as int) AS rk
         | FROM embeddings q CROSS JOIN embeddings e
         | WHERE q.vec_id < $nQueries)
         |WHERE rk <= $topK ORDER BY query_id, rk""".stripMargin,

    "q41_knn_lsh" ->
      s"""WITH b AS (
         | SELECT vec_id, embedding, ${bucketExprDuck("embedding")} AS bucket
         | FROM embeddings)
         |SELECT query_id, rk, vec_id, cosine FROM (
         | SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |  ${dotDuck("q.embedding", "e.embedding")} AS cosine,
         |  cast(row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY ${dotDuck("q.embedding", "e.embedding")} DESC, e.vec_id) as int) AS rk
         | FROM b q JOIN b e ON q.bucket = e.bucket
         | WHERE q.vec_id < $nQueries)
         |WHERE rk <= $topK ORDER BY query_id, rk""".stripMargin,

    "q42_knn_ivf" ->
      s"""WITH c AS (
         | SELECT vec_id, embedding, ${clusterExprDuck("embedding")} AS cluster
         | FROM embeddings)
         |SELECT query_id, rk, vec_id, cosine FROM (
         | SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |  ${dotDuck("q.embedding", "e.embedding")} AS cosine,
         |  cast(row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY ${dotDuck("q.embedding", "e.embedding")} DESC, e.vec_id) as int) AS rk
         | FROM c q JOIN c e ON q.cluster = e.cluster
         | WHERE q.vec_id < $nQueries)
         |WHERE rk <= $topK ORDER BY query_id, rk""".stripMargin
  )
}
