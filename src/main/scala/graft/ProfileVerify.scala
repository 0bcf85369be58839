package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: stage costs of the CURRENT q31b/q133 (not part of the
  * contract).
  */
object ProfileVerify {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.register(spark)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000000).count()
    import org.apache.spark.sql.expressions.Window
    val (p, q) = (1, 2)
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val sh = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), expr("graft_shingles(split(trim(text), '\\\\s+'), 3)").as("sh"))
      val shCp = timed("shCp (scan+shingle+sort ckpt)")(
        sh.select(col("doc_id"), sort_array(col("sh")).as("sh")).localCheckpoint())
      val tok = shCp.select(col("doc_id"), expr("size(sh)").as("n"),
        explode(col("sh")).as("shingle"))
      val dfs = tok.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") >= 2)
      val wDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
      val prefix = timed("prefix ckpt")(
        tok.join(dfs, Seq("shingle"), "left")
          .withColumn("df", coalesce(col("df"), lit(1L)))
          .withColumn("rn", row_number().over(wDoc))
          .filter(col("rn") <= expr(s"n - ($p * n + ${q - 1}) div $q + 1"))
          .filter(col("df") >= 2)
          .select("shingle", "doc_id", "n", "rn")
          .localCheckpoint())
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
      timed("cand only (count)")(cands.count())
      val shA = shCp.toDF("id_a", "sh_a")
      val shB = shCp.toDF("id_b", "sh_b")
      timed("cand+verify (count)")(
        cands.join(shA, "id_a").join(shB, "id_b")
          .withColumn("inter", expr("graft_sorted_intersect_size(sh_a, sh_b)"))
          .withColumn("jaccard", col("inter").cast("double") /
            (expr("size(sh_a)") + expr("size(sh_b)") - col("inter")))
          .filter(col("jaccard") >= 0.5)
          .count())
      timed("full q31b")(
        SparkEntry.queries("q31b_prefix_jaccard")(spark, dir)
          .write.format("noop").mode("overwrite").save())
      timed("full q133")(
        SparkEntry.queries("q133_blocking_recall")(spark, dir)
          .write.format("noop").mode("overwrite").save())
      // variant: NO prefix checkpoint — does ReusedExchange run the
      // prefix pipeline once for both self-join sides?
      val prefixNoCp = tok.join(dfs, Seq("shingle"), "left")
        .withColumn("df", coalesce(col("df"), lit(1L)))
        .withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") <= expr(s"n - ($p * n + ${q - 1}) div $q + 1"))
        .filter(col("df") >= 2)
        .select("shingle", "doc_id", "n", "rn")
      val a2 = prefixNoCp.toDF("shingle", "id_a", "n_a", "rn_a")
      val b2 = prefixNoCp.toDF("shingle", "id_b", "n_b", "rn_b")
      val cands2 = a2.join(b2.hint("shuffle_hash"), "shingle")
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
      val v2 = cands2.join(shA, "id_a").join(shB, "id_b")
        .withColumn("inter", expr("graft_sorted_intersect_size(sh_a, sh_b)"))
        .withColumn("jaccard", col("inter").cast("double") /
          (expr("size(sh_a)") + expr("size(sh_b)") - col("inter")))
        .filter(col("jaccard") >= 0.5)
      timed("no-ckpt variant (count)")(v2.count())
      timed("no-ckpt variant again")(v2.count())
      val reused = v2.queryExecution.executedPlan.toString
      println("[prof] ReusedExchange in plan: " + reused.contains("ReusedExchange"))
    }
    spark.stop()
  }
}
