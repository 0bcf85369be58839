package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ShardWriter

/** Shard materialization layout: one directory and ONE data file per
  * shard, rows inside a shard file in packing (cumulative-token) order.
  */
class ShardWriterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = sys.props.get("graft.testdata")
    .orElse(sys.env.get("GRAFT_TESTDATA")).getOrElse("/root/testdata/sf0.001")

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def deleteRecursively(p: Path): Unit = {
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => Files.deleteIfExists(f))
  }

  test("one directory and one data file per shard; packing order within") {
    val out = Files.createTempDirectory("shard_writer")
    try {
      val packed = SparkEntry.queries("q63_shard_packing")(spark, sf)
      ShardWriter.write(packed, out.toString)

      val shardDirs = Files.list(out).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("shard_id=")).toSeq
      assert(shardDirs.nonEmpty)
      shardDirs.foreach { d =>
        val dataFiles = Files.list(d).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        assert(dataFiles.size == 1,
          s"expected exactly one file in $d, got ${dataFiles.map(_.getFileName)}")
      }

      // read back one whole shard file: row order inside the single file
      // is the packing order (monotone cum_tokens), and the shard holds
      // exactly the docs q63 assigned to it
      val expected = packed.filter(org.apache.spark.sql.functions.col("shard_id") === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val file0 = Files.list(out.resolve(s"shard_id=0")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      val rows = spark.read.parquet(file0.toString)
        .select("doc_id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.map(_._1).toSet == expected)
      assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        "rows inside the shard file must be in cumulative-token order")
    } finally deleteRecursively(out)
  }
}
