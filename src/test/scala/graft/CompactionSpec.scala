package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Compaction

/** Small-file compaction: many tiny parquet files bin-pack into few
  * target-sized ones, conserving every row, in one distributed rewrite.
  */
class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => Files.deleteIfExists(f))

  test("tiny files bin-pack into few files; rows conserved; groups respect the byte target") {
    val root = Files.createTempDirectory("compaction")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    try {
      import spark.implicits._
      // a streaming-ingest-shaped mess: 40 tiny files
      (0L until 4000L).map(i => (i, s"payload_$i")).toDF("id", "payload")
        .repartition(40).write.parquet(in)
      // one EXTENSIONLESS data file (Hive-style 'part-00000'): the
      // reader reads it, so compaction must assign and keep its rows
      val first = Files.list(java.nio.file.Paths.get(in)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
      Files.move(first, first.resolveSibling("datafile-noext"))
      val smallSizes = Files.list(java.nio.file.Paths.get(in)).iterator().asScala
        .filter(!_.getFileName.toString.startsWith("_"))
        .filter(Files.isRegularFile(_))
        .map(Files.size).toSeq
      val target = smallSizes.sum / 4 // aim for ~4 output files

      val stats = Compaction.compact(spark, in, out, target)
      assert(stats.filesBefore == 40)
      assert(stats.filesAfter == stats.groups,
        s"one file per group: $stats")
      assert(stats.filesAfter <= 6, s"expected ~5 compacted files: $stats")

      val got = spark.read.parquet(out).select("id", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = (0L until 4000L).map(i => (i, s"payload_$i")).toSet
      assert(got == want, "compaction must conserve every row exactly")

      // no output group may exceed target + one input file (first-fit
      // closes a group only after it crosses the target)
      val maxIn = smallSizes.max
      Files.list(java.nio.file.Paths.get(out)).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("grp="))
        .foreach { d =>
          val bytes = Files.list(d).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(Files.size).sum
          assert(bytes <= target + maxIn * 2,
            s"group $d holds $bytes bytes vs target $target")
        }
    } finally deleteRecursively(root)
  }

  test("row conservation holds for seeded random file layouts and targets") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val root = Files.createTempDirectory(s"compaction_r$trial")
      try {
        import spark.implicits._
        val in = root.resolve("in").toString
        val out = root.resolve("out").toString
        val nRows = 500 + rnd.nextInt(2000)
        val nFiles = 3 + rnd.nextInt(30)
        (0L until nRows.toLong).map(i => (i, rnd.nextLong())).toDF("id", "v")
          .repartition(nFiles).write.parquet(in)
        val total = Files.list(java.nio.file.Paths.get(in)).iterator().asScala
          .filter(p => Files.isRegularFile(p) &&
            !p.getFileName.toString.startsWith("_"))
          .map(Files.size).sum
        val target = math.max(total / (1 + rnd.nextInt(8)), 1L)
        val stats = Compaction.compact(spark, in, out, target)
        assert(stats.filesAfter == stats.groups, s"trial $trial: $stats")
        assert(spark.read.parquet(out).count() == nRows,
          s"trial $trial lost rows: $stats")
      } finally deleteRecursively(root)
    }
  }
}
