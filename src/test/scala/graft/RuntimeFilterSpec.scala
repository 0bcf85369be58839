package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning — the runtime scan-skipping that carries
  * partitioned fact tables at 100 TB: a selective dimension filter is
  * turned into a runtime partition filter on the fact scan, so only the
  * matching partition directories are read at all. This is free for any
  * layout written with `partitionBy` (the loader's templated layout is
  * exactly that shape).
  */
class RuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = java.nio.file.Files.createTempDirectory("dpp").toString

  override def afterAll(): Unit = {
    spark.stop()
    // clean the parquet fixture — createTempDirectory does not auto-delete
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }

  test("a selective dim filter prunes fact partitions at runtime (DPP)") {
    import spark.implicits._
    spark.range(10000)
      .select((col("id") % 5).cast("string").as("k"), col("id").as("v"))
      .write.partitionBy("k").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(5).select(col("id").cast("string").as("k"))
      .filter(col("k") === "2")
    val j = fact.join(dim, "k").agg(sum(col("v")).as("s"))
    val got = j.as[Long].head()
    // ids ≡ 2 mod 5: 2 + 7 + ... — closed form over 2000 members
    val expect = (0L until 10000L).filter(_ % 5 == 2).sum
    assert(got == expect)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a runtime partition filter on the fact scan:\n${plan.take(3000)}")
  }
}
