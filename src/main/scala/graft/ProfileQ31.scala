package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiler for q31b/q133 (not part of the contract). */
object ProfileQ31 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val (p, q) = (1, 2)
    def sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), expr("graft_shingles(split(trim(text), '\\\\s+'), 3)").as("sh"))

    time("warmup")(spark.range(1000000).count())
    // --- the CURRENT prefixJaccardPairs stages ---
    val tok = sh.select(col("doc_id"), expr("size(sh)").as("n"),
      explode(col("sh")).as("shingle"))
    time("tok explode+checkpoint")(0L)
    val tokCp = tok.localCheckpoint()
    time("  (materialize)")(tokCp.count())
    val dfs = tokCp.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    time("dfs agg")(dfs.count())
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val joined = tokCp.join(dfs, Seq("shingle"), "left")
      .withColumn("df", coalesce(col("df"), lit(1L)))
    time("df join-back")(joined.count())
    val ranked = joined.withColumn("rn", row_number().over(wDoc))
    time("join-back + rn window")(ranked.count())
    val prefixNoCp = ranked
      .filter(col("rn") <= expr(s"n - ($p * n + ${q - 1}) div $q + 1"))
      .filter(col("df") >= 2)
      .select("shingle", "doc_id", "n", "rn")
    val prefix = prefixNoCp.localCheckpoint()
    time("prefix materialize")(prefix.count())
    val a = prefix.toDF("shingle", "id_a", "n_a", "rn_a")
    val b = prefix.toDF("shingle", "id_b", "n_b", "rn_b")
    val cands = a.join(b.hint("shuffle_hash"), "shingle")
      .filter(col("id_a") < col("id_b"))
      .filter(col("n_b") * q >= col("n_a") * p && col("n_a") * q >= col("n_b") * p)
      .filter(least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) + 1
        >= expr(s"($p * (n_a + n_b) + ${p + q - 1}) div ${p + q}"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"),
        max(col("rn_a")).as("ma"), max(col("rn_b")).as("mb"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .filter(col("c") + least(col("n_a") - col("ma"), col("n_b") - col("mb"))
        >= expr(s"($p * (n_a + n_b) + ${p + q - 1}) div ${p + q}"))
      .select("id_a", "id_b")
    time("cand self-join+posfilter")(cands.count())
    val cp = cands.localCheckpoint()
    val shA = sh.toDF("id_a", "sh_a")
    val shB = sh.toDF("id_b", "sh_b")
    val verified = cp.join(shA, "id_a").join(shB, "id_b")
      .withColumn("inter", expr("size(array_intersect(sh_a, sh_b))"))
      .withColumn("jaccard", col("inter").cast("double") /
        (expr("size(sh_a)") + expr("size(sh_b)") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    time("verify join")(verified.count())
    time("full q31b")(SparkEntry.queries("q31b_prefix_jaccard")(spark, dir).count())
    time("full q31b again")(SparkEntry.queries("q31b_prefix_jaccard")(spark, dir).count())
    time("full q133")(SparkEntry.queries("q133_blocking_recall")(spark, dir).count())
    time("full q133 again")(SparkEntry.queries("q133_blocking_recall")(spark, dir).count())
    spark.stop()
  }
}
