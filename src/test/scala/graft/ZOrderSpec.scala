package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Morton-key layout: the interleave is a bijection, and chunking a
  * z-sorted table bounds BOTH dimensions per chunk — the property parquet
  * min/max file skipping prunes on.
  */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("interleave is a bijection on the 8-bit x 8-bit grid") {
    import spark.implicits._
    val grid = spark.range(256 * 256)
      .select((col("id") % 256).cast("int").as("x"),
        (col("id") / 256).cast("int").as("y"))
      .withColumn("z", ZOrder.interleave(col("x"), col("y"), 8))
    // 65536 distinct z values covering exactly [0, 65535] — a bijection
    val stats = grid.agg(
      countDistinct("z").as("nd"), min("z").as("mn"), max("z").as("mx"))
      .as[(Long, Int, Int)].head()
    assert(stats == ((65536L, 0, 65535)))
    // de-interleave round-trip: even bits rebuild x, odd bits rebuild y
    val back = grid.withColumn("x2",
        (0 until 8).map(i => shiftleft(shiftright(col("z"), 2 * i)
          .bitwiseAND(lit(1)), i)).reduce(_ + _))
      .withColumn("y2",
        (0 until 8).map(i => shiftleft(shiftright(col("z"), 2 * i + 1)
          .bitwiseAND(lit(1)), i)).reduce(_ + _))
    assert(back.filter(col("x2") =!= col("x") || col("y2") =!= col("y")).isEmpty)
  }

  test("z-sorted chunks bound both dimensions where an x-sort leaves y unbounded") {
    import spark.implicits._
    val n = 1 << 14
    val pts = spark.range(n).select(
        pmod(hash(col("id")), lit(256)).cast("int").as("x"),
        pmod(hash(col("id") + 1000000), lit(256)).cast("int").as("y"))
      .withColumn("z", ZOrder.interleave(col("x"), col("y"), 8))
    val files = 16
    def maxYSpread(ordered: org.apache.spark.sql.DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(ordered.columns.last)
      ordered
        .withColumn("file", ((row_number().over(w) - 1) * files / n).cast("int"))
        .groupBy("file").agg((max("y") - min("y")).as("spread"))
        .agg(max("spread")).as[Long].head()
    }
    // x-sorted files: y is uniform inside every file → spread ~255.
    // z-sorted files: each of 16 files covers 1/16 of the Morton curve,
    // whose bounding box halves y — spread <= 127 by construction.
    val xSpread = maxYSpread(pts.select(col("y"), col("x")))
    val zSpread = maxYSpread(pts.select(col("y"), col("z")))
    assert(zSpread <= 128, s"z-sorted y-spread $zSpread")
    assert(xSpread > 200, s"x-sorted y-spread $xSpread")
  }
}
