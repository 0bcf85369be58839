package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN (q48): structural guarantees of the ADC
  * scheme. A query's own codes are per-subspace argmaxes of its OWN ADC
  * table, so the self vector always attains the maximum achievable
  * score — the sanity property distinguishing a correct encode/lookup
  * wiring from a plausible-looking but shuffled one.
  */
class PQSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val rows = SparkEntry.queries("q48_pq_ann")(spark, sf)
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

  test("five queries × top-10, scores non-increasing in rank") {
    assert(rows.length == 50)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to 10), s"query $qid ranks")
      byRank.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi._4 >= lo._4, s"query $qid: score increases $hi -> $lo")
      }
    }
  }

  test("the self vector attains the maximum ADC score per query") {
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val top = rs.map(_._4).max
      val self = rs.find(r => r._3 == qid)
      assert(self.isDefined, s"query $qid: self vector missing from top-10")
      assert(self.get._4 == top,
        s"query $qid: self score ${self.get._4} below top $top")
    }
  }
}
