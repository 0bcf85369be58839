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
    spark.stop()
  }
}
