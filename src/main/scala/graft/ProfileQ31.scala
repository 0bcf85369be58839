package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiler for q31 (not part of the contract). */
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
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    graft.functions.GraftFunctions.register(spark)
    def docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), expr("graft_shingles(split(trim(text), '\\\\s+'), 3)").as("sh"))
      .select(col("doc_id"), expr("size(sh)").as("n_sh"), explode(col("sh")).as("shingle"))

    time("warmup")(spark.range(1000000).count())
    time("explode side")(docs.count())
    time("explode side again")(docs.count())
    val a = docs.toDF("id_a", "n_a", "shingle")
    val b = docs.toDF("id_b", "n_b", "shingle")
    val joined = a.join(b, "shingle").filter(col("id_a") < col("id_b"))
    time("join only")(joined.count())
    val grouped = joined.groupBy("id_a", "id_b", "n_a", "n_b").agg(count(lit(1)).as("shared"))
    time("join+group")(grouped.count())
    time("full q31")(SparkEntry.queries("q31_ngram_jaccard")(spark, dir).count())

    // --- q31b stage-by-stage (mirrors prefixJaccardPairs at t = 1/2) ---
    import org.apache.spark.sql.expressions.Window
    val (p, q) = (1, 2)
    def sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), expr("graft_shingles(split(trim(text), '\\\\s+'), 3)").as("sh"))
    val tok = sh.select(col("doc_id"), expr("size(sh)").as("n"),
      explode(col("sh")).as("shingle"))
    time("b: tok explode")(tok.count())
    val wSh = Window.partitionBy("shingle")
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val prefixNoCp = tok
      .withColumn("df", count(lit(1)).over(wSh))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= expr(s"n - ($p * n + ${q - 1}) div $q + 1"))
      .select("shingle", "doc_id", "n", "rn")
    time("b: df window only")(tok.withColumn("df", count(lit(1)).over(wSh)).count())
    time("b: prefix build (2 windows)")(prefixNoCp.count())
    val prefix = prefixNoCp.localCheckpoint()
    val aa = prefix.toDF("shingle", "id_a", "n_a", "rn_a")
    val bb = prefix.toDF("shingle", "id_b", "n_b", "rn_b")
    val cands = aa.join(bb.hint("shuffle_hash"), "shingle")
      .filter(col("id_a") < col("id_b"))
      .filter(col("n_b") * q >= col("n_a") * p && col("n_a") * q >= col("n_b") * p)
      .filter(least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) + 1
        >= expr(s"($p * (n_a + n_b) + ${p + q - 1}) div ${p + q}"))
      .select("id_a", "id_b").distinct()
    time("b: cand self-join+distinct")(cands.count())
    val cp = cands.localCheckpoint()
    val shA = sh.toDF("id_a", "sh_a")
    val shB = sh.toDF("id_b", "sh_b")
    val verified = cp.join(shA, "id_a").join(shB, "id_b")
      .withColumn("inter", expr("size(array_intersect(sh_a, sh_b))"))
      .withColumn("jaccard", col("inter").cast("double") /
        (expr("size(sh_a)") + expr("size(sh_b)") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    time("b: verify join")(verified.count())
    time("full q31b")(SparkEntry.queries("q31b_prefix_jaccard")(spark, dir).count())
    time("full q31b again")(SparkEntry.queries("q31b_prefix_jaccard")(spark, dir).count())

    val shCp = sh.localCheckpoint()
    val shA2 = shCp.toDF("id_a", "sh_a")
    val shB2 = shCp.toDF("id_b", "sh_b")
    val v2 = cp.join(shA2, "id_a").join(shB2, "id_b")
      .withColumn("inter", expr("size(array_intersect(sh_a, sh_b))"))
      .withColumn("jaccard", col("inter").cast("double") /
        (expr("size(sh_a)") + expr("size(sh_b)") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    time("b: verify w/ sh checkpoint")(v2.count())
    time("b: verify w/ sh cp again")(v2.count())
    val v3 = shCp.toDF("id_a", "sh_a").join(broadcast(cp), "id_a")
      .join(shB2, "id_b")
      .withColumn("inter", expr("size(array_intersect(sh_a, sh_b))"))
      .withColumn("jaccard", col("inter").cast("double") /
        (expr("size(sh_a)") + expr("size(sh_b)") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    time("b: verify bcast cands")(v3.count())
    time("b: verify bcast again")(v3.count())
    spark.stop()
  }
}
