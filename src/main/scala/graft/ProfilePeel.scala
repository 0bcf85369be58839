package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: q143 peel-round plan + cost (not part of the contract). */
object ProfilePeel {
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
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000000).count()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = timed("edge build ckpt")(
      li.toDF("ok", "pa")
        .join(li.toDF("ok", "pb").hint("shuffle_hash"), "ok")
        .filter(col("pa") < col("pb"))
        .select("pa", "pb").distinct().localCheckpoint())
    println(s"[prof] edges=${edges.count()}")
    var e = timed("symmetric repartition ckpt")(
      edges.select(col("pa").as("src"), col("pb").as("dst"))
        .unionAll(edges.select(col("pb").as("src"), col("pa").as("dst")))
        .repartition(col("src"))
        .localCheckpoint())
    for (r <- 1 to 6) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 80).select("src")
      val next = e.join(keep, Seq("src"), "left_semi")
        .select(col("dst").as("src"), col("src").as("dst"))
        .join(keep, Seq("src"), "left_semi")
      if (r == 1) {
        println("== round plan ==")
        next.explain("formatted")
      }
      e = timed(s"round $r")(next.localCheckpoint())
    }
    timed("full q143")(SparkEntry.queries("q143_kcore")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    timed("full q143 again")(SparkEntry.queries("q143_kcore")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
