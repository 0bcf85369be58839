package graft

import org.apache.spark.sql.SparkSession

/** Local smoke tool: exercises SparkEntry.entry the way the driver does
  * (rows > 0 on sf0.001) and prints the physical plan for inspection.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "driver smoke check would fail: entry returned 0 rows")
    spark.stop()
  }
}
