package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Native expression semantics: graft_dot's fold order, null contract
  * (length mismatch ⇒ NULL, matching the zip_with/list_zip composed form),
  * and graft_shingles' distinct-3-gram output.
  */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def dotOf(a: Seq[Float], b: Seq[Float]): Option[Double] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq((a, b)).toDF("a", "b")
      .selectExpr("graft_dot(a, b) AS d").collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("graft_dot: left-fold double accumulation on equal lengths") {
    assert(dotOf(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)).contains(32.0))
    assert(dotOf(Seq.empty, Seq.empty).contains(0.0))
  }

  test("graft_dot: length mismatch is NULL, never a truncated partial product") {
    assert(dotOf(Seq(1f, 2f, 3f), Seq(4f, 5f)).isEmpty)
    assert(dotOf(Seq(1f), Seq.empty).isEmpty)
  }

  test("graft_dot: NULL array propagates NULL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(Seq(1f, 2f))).toDF("a")
      .selectExpr("graft_dot(a, cast(null as array<float>)) AS d").collect()(0)
    assert(r.isNullAt(0))
  }

  test("graft_shingles: distinct 3-gram shingles over a token array") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_shingles(array('a','b','c','d','a','b','c','d'), 3) AS sh")
      .collect()(0).getSeq[String](0)
    assert(r.contains("a b c") && r.contains("b c d"))
    assert(r.distinct.size == r.size)
  }
}
