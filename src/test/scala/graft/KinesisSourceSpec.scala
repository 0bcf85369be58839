package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}
import java.time.Instant

import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.sinks.InMemoryBlobStore
import graft.sources.RecordSources
import graft.streaming.{LoaderPipeline, ServiceHealth}

/** S1 executed end-to-end: `RecordSources.build`'s Kinesis branch — the
  * reference's only production source — driven for real through
  * `LoaderPipeline.stream` via the file-backed DSv2 double registered
  * under the connector format name (KinesisFileSource). Covers option
  * mapping (initialPosition, maxFetchRecordsPerShard admission control),
  * multi-shard reads, at-least-once checkpoint replay, and sink health.
  */
class KinesisSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("kinesis-source-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val tmpRoots = scala.collection.mutable.ListBuffer.empty[Path]

  override def afterAll(): Unit = {
    spark.stop()
    import scala.reflect.io.Directory
    tmpRoots.foreach(p => new Directory(p.toFile).deleteRecursively())
  }

  private val fixedNow = Instant.parse("1970-01-01T00:00:00Z")

  private def tsv(i: Int): String =
    f"app\tweb\t\t1970-01-01 00:00:$i%02d.000\t\tpage_view\tid-$i"

  private def newDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    tmpRoots += p
    p
  }

  private def writeShard(dir: Path, shard: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(shard),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  /** The production wiring under test: HOCON surface → Kinesis config →
    * format(connectorFormat) readStream → loader pipeline.
    */
  private def kinesisConfig(streamDir: Path, pos: String, maxRecords: Int) =
    RecordSources.Kinesis(
      streamName = streamDir.toString,
      region = "local",
      initialPosition = pos,
      maxRecords = maxRecords,
      connectorFormat = "graft-kinesis")

  // short maxDelay: sequential micro-batches fire at the trigger
  // interval, so the default 2-minute reference parity value would make
  // the multi-batch cases wait it out between polls
  private def loaderCfg(ckpt: Path) = LoaderConfig(
    Purpose.Enriched, Output("mem://good"), BadOutput("mem://bad"),
    batching = Batching(maxDelay = 50.millis),
    checkpointLocation = Some(ckpt.toString))

  test("S1: two shards, TRIM_HORIZON — every record lands via the connector-format branch") {
    val streamDir = newDir("kinesis-stream")
    writeShard(streamDir, "shard-0000", (0 until 3).map(tsv))
    writeShard(streamDir, "shard-0001", (3 until 5).map(tsv))

    val src = RecordSources.build(
      spark, kinesisConfig(streamDir, "TRIM_HORIZON", maxRecords = 100))
    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics
    val health = new ServiceHealth
    val q = LoaderPipeline.stream(
      src, loaderCfg(newDir("kinesis-ckpt")), store, metrics, () => fixedNow,
      health).start()
    try {
      q.processAllAvailable()
      assert(metrics.count.get() == 5)
      assert(metrics.badCount.get() == 0)
      assert(store.paths.nonEmpty)
      assert(health.healthy)
    } finally q.stop()
  }

  test("S1: maxFetchRecordsPerShard paces micro-batches (admission control)") {
    val streamDir = newDir("kinesis-paced")
    writeShard(streamDir, "shard-0000", (0 until 6).map(tsv))

    val src = RecordSources.build(
      spark, kinesisConfig(streamDir, "TRIM_HORIZON", maxRecords = 2))
    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics
    val q = LoaderPipeline.stream(
      src, loaderCfg(newDir("kinesis-ckpt")), store, metrics, () => fixedNow).start()
    try {
      q.processAllAvailable()
      // all 6 arrive, but no single micro-batch may exceed the 2-record
      // poll bound: ≥3 batches → ≥3 distinct objects
      assert(metrics.count.get() == 6)
      assert(store.paths.size >= 3)
    } finally q.stop()
  }

  test("S1/T7: restart from checkpoint resumes at the committed sequence numbers") {
    val streamDir = newDir("kinesis-replay")
    val ckpt = newDir("kinesis-ckpt")
    writeShard(streamDir, "shard-0000", (0 until 3).map(tsv))

    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics
    val cfg = loaderCfg(ckpt)
    def startQuery() = LoaderPipeline.stream(
      RecordSources.build(spark, kinesisConfig(streamDir, "TRIM_HORIZON", 100)),
      cfg, store, metrics, () => fixedNow).start()

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(metrics.count.get() == 3)

    // more records arrive while the loader is down; on restart only the
    // uncommitted tail replays (offsets acked after the durable write)
    writeShard(streamDir, "shard-0000", (3 until 7).map(tsv))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(metrics.count.get() == 7) // would be 10 if batch 1 replayed
    } finally q2.stop()
  }

  test("S1: LATEST skips the backlog; records appended after start are consumed") {
    val streamDir = newDir("kinesis-latest")
    writeShard(streamDir, "shard-0000", (0 until 4).map(tsv))

    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics
    val q = LoaderPipeline.stream(
      RecordSources.build(spark, kinesisConfig(streamDir, "LATEST", 100)),
      loaderCfg(newDir("kinesis-ckpt")), store, metrics, () => fixedNow).start()
    try {
      q.processAllAvailable() // initial offset = current shard ends
      assert(metrics.count.get() == 0)
      writeShard(streamDir, "shard-0000", (4 until 6).map(tsv))
      q.processAllAvailable()
      assert(metrics.count.get() == 2)
    } finally q.stop()
  }

  test("S1: a shard appearing mid-query (resharding) is read from its beginning") {
    val streamDir = newDir("kinesis-reshard")
    writeShard(streamDir, "shard-0000", (0 until 2).map(tsv))

    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics
    val q = LoaderPipeline.stream(
      RecordSources.build(spark, kinesisConfig(streamDir, "TRIM_HORIZON", 100)),
      loaderCfg(newDir("kinesis-ckpt")), store, metrics, () => fixedNow).start()
    try {
      q.processAllAvailable()
      assert(metrics.count.get() == 2)
      writeShard(streamDir, "shard-0001", (2 until 5).map(tsv))
      q.processAllAvailable()
      assert(metrics.count.get() == 5)
    } finally q.stop()
  }

  test("S1: shard split mid-batch with in-flight parent offsets, then merge, across a checkpoint restart (r10 verdict #8)") {
    val streamDir = newDir("kinesis-split")
    val ckpt = newDir("kinesis-split-ckpt")
    // parent shard: 5 records, drained under 2-record admission control
    writeShard(streamDir, "shard-parent", (0 until 5).map(tsv))
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    def start() = spark.readStream.format("graft-kinesis")
      .option("streamName", streamDir.toString)
      .option("initialPosition", "TRIM_HORIZON")
      .option("maxFetchRecordsPerShard", "2")
      .load()
      .selectExpr("cast(data as string) AS line", "shardId", "sequenceNumber")
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.collect().map(r =>
            (r.getString(0), r.getString(1), r.getString(2)))
        }
        ()
      }.start()
    var q = start()
    try {
      q.processAllAvailable()
      assert(got.size == 5, s"parent drain: ${got.size}")
      // SPLIT while the parent still has unread backlog: 4 in-flight
      // parent records appended, then the two children appear — the
      // child-shard pickup must not lose or re-read the parent backlog
      writeShard(streamDir, "shard-parent", (5 until 9).map(tsv))
      writeShard(streamDir, "shard-childa", (9 until 12).map(tsv))
      writeShard(streamDir, "shard-childb", (12 until 14).map(tsv))
      q.processAllAvailable()
      assert(got.size == 14, s"post-split: ${got.size}")
    } finally q.stop()
    // MERGE while the query is DOWN: one child keeps growing, the merged
    // shard appears; the restart must resume every cursor from the
    // offset log (parent fully drained, children mid-cursor) and read
    // only the new records
    writeShard(streamDir, "shard-childa", (14 until 16).map(tsv))
    writeShard(streamDir, "shard-merged", (16 until 19).map(tsv))
    q = start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    assert(got.size == 19, s"after restart: ${got.size}")
    // exactly-once: every written record present once, per-shard cursors
    // contiguous from 0
    val byShard = got.groupBy(_._2).view
      .mapValues(_.map(_._3.toLong).sorted).toMap
    assert(byShard("shard-parent") == (0L until 9L),
      s"parent cursors: ${byShard("shard-parent")}")
    assert(byShard("shard-childa") == (0L until 5L))
    assert(byShard("shard-childb") == (0L until 2L))
    assert(byShard("shard-merged") == (0L until 3L))
    val lines = got.map(_._1).sorted
    assert(lines == (0 until 19).map(tsv).sorted,
      "payload multiset must be exactly the 19 written records")
  }

  test("S1: the HOCON input block drives the connector end-to-end") {
    val streamDir = newDir("kinesis-hocon")
    writeShard(streamDir, "shard-0000", (0 until 3).map(tsv))
    // the reference's config surface (config.aws.reference.hocon input
    // block), streamName pointing at the double's backing directory
    val hocon =
      s"""{
         |  "input": {
         |    "streamName": "$streamDir",
         |    "initialPosition": { "type": "TRIM_HORIZON" },
         |    "retrievalMode": { "maxRecords": 100 }
         |  }
         |}""".stripMargin
    val k = RecordSources.kinesisFromHocon(hocon, region = "local")
      .fold(e => fail(e), identity)
      .copy(connectorFormat = "graft-kinesis")
    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics
    val q = LoaderPipeline.stream(
      RecordSources.build(spark, k),
      loaderCfg(newDir("kinesis-ckpt")), store, metrics, () => fixedNow).start()
    try {
      q.processAllAvailable()
      assert(metrics.count.get() == 3)
    } finally q.stop()
  }

  test("S1: missing streamName fails fast at source construction") {
    val e = intercept[Exception] {
      spark.readStream.format("graft-kinesis").load().isStreaming
    }
    assert(String.valueOf(e.getMessage).contains("streamName"))
  }

  test("S1: AT_TIMESTAMP keys off shard arrival time — old shards tail, fresh shards replay") {
    val streamDir = newDir("kinesis-at-ts")
    writeShard(streamDir, "shard-old", (0 until 4).map(tsv))
    writeShard(streamDir, "shard-new", (4 until 7).map(tsv))
    // backdate the old shard's arrival; the cut falls between the two
    java.nio.file.Files.setLastModifiedTime(streamDir.resolve("shard-old"),
      java.nio.file.attribute.FileTime.fromMillis(
        java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli))
    val df = spark.readStream.format("graft-kinesis")
      .option("streamName", streamDir.toString)
      .option("initialPosition", "AT_TIMESTAMP")
      .option("initialTimestamp", "2024-06-01T00:00:00Z")
      .load()
    val q = df.writeStream.format("memory").queryName("at_ts").start()
    try {
      q.processAllAvailable()
      // fresh shard replays its 3 backlog records; the backdated shard
      // starts at its end (nothing until a future append)
      assert(spark.table("at_ts").count() == 3)
      writeShard(streamDir, "shard-old", Seq(tsv(9)))
      q.processAllAvailable()
      val byShard = spark.table("at_ts").groupBy("shardId").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byShard == Map("shard-new" -> 3L, "shard-old" -> 1L),
        s"got $byShard")
    } finally q.stop()
  }

  test("S1: the published connector's option spelling (kinesis.*) decodes identically") {
    // the awslabs spark-sql-kinesis-connector spelling — see the
    // conformance table on RecordSources.kinesisOptions; a production
    // swap must be config-only, so the double accepts both spellings
    val streamDir = newDir("kinesis-conn-spelling")
    writeShard(streamDir, "shard-0000", (0 until 5).map(tsv))
    val df = spark.readStream.format("graft-kinesis")
      .option("kinesis.streamName", streamDir.toString)
      .option("kinesis.region", "local")
      .option("kinesis.startingPosition", "TRIM_HORIZON")
      .option("kinesis.maxFetchRecordsPerShard", "2")
      .load()
    val q = df.writeStream.format("memory").queryName("conn_spelling").start()
    try {
      q.processAllAvailable()
      val batches = spark.table("conn_spelling").count()
      assert(batches == 5, s"expected all 5 records via kinesis.* options, got $batches")
      // admission control honored the prefixed maxFetchRecordsPerShard:
      // 5 records at ≤2/shard/trigger means ≥3 micro-batches committed
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("S1: JSON-valued kinesis.startingPosition decodes as AT_TIMESTAMP (r6 advice)") {
    // the published connector renders AT_TIMESTAMP as a JSON object VALUE
    // of kinesis.startingPosition — a config-only swap must decode it,
    // not silently fall back to the horizon (which would re-read the
    // backdated shard's full backlog)
    val streamDir = newDir("kinesis-json-pos")
    writeShard(streamDir, "shard-old", (0 until 4).map(tsv))
    writeShard(streamDir, "shard-new", (4 until 7).map(tsv))
    java.nio.file.Files.setLastModifiedTime(streamDir.resolve("shard-old"),
      java.nio.file.attribute.FileTime.fromMillis(
        java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli))
    val df = spark.readStream.format("graft-kinesis")
      .option("kinesis.streamName", streamDir.toString)
      .option("kinesis.startingPosition",
        """{"at_timestamp": "2024-06-01T00:00:00Z"}""")
      .load()
    val q = df.writeStream.format("memory").queryName("json_pos").start()
    try {
      q.processAllAvailable()
      // identical semantics to the bare AT_TIMESTAMP case: the fresh
      // shard replays its 3 records, the backdated shard tails
      assert(spark.table("json_pos").count() == 3,
        s"horizon fallback would have read all 7, got ${spark.table("json_pos").count()}")
    } finally q.stop()
  }

  test("S1: JSON latest / trim_horizon positions decode; unknown JSON is rejected (r7 advice)") {
    // {"latest": true} must behave as LATEST (skip the backlog) — falling
    // through to the horizon would silently replay everything
    val streamDir = newDir("kinesis-json-latest")
    writeShard(streamDir, "shard-0000", (0 until 6).map(tsv))
    val latest = spark.readStream.format("graft-kinesis")
      .option("kinesis.streamName", streamDir.toString)
      .option("kinesis.startingPosition", """{"latest": true}""")
      .load()
    val q1 = latest.writeStream.format("memory").queryName("json_latest").start()
    try {
      q1.processAllAvailable()
      assert(spark.table("json_latest").count() == 0,
        "JSON latest read the backlog — the r7 horizon fall-through")
    } finally q1.stop()

    val horizon = spark.readStream.format("graft-kinesis")
      .option("kinesis.streamName", streamDir.toString)
      .option("kinesis.startingPosition", """{"trim_horizon": true}""")
      .load()
    val q2 = horizon.writeStream.format("memory").queryName("json_horizon").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("json_horizon").count() == 6)
    } finally q2.stop()

    // an unrecognized JSON object must fail loudly, not replay the world
    val e = intercept[Exception] {
      spark.readStream.format("graft-kinesis")
        .option("kinesis.streamName", streamDir.toString)
        .option("kinesis.startingPosition", """{"earliest": true}""")
        .load()
        .writeStream.format("memory").queryName("json_bad").start()
        .processAllAvailable()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage)
        .exists(_.contains("Unrecognized JSON kinesis.startingPosition"))),
      s"wrong failure: $e")

    // r8 advice: the position token must appear in KEY position — a
    // value-side "latest" ({"foo": "latest"}) is NOT a latest position
    // and must be rejected, not accepted as LATEST
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-kinesis")
        .option("kinesis.streamName", streamDir.toString)
        .option("kinesis.startingPosition", """{"foo": "latest"}""")
        .load()
        .writeStream.format("memory").queryName("json_bad2").start()
        .processAllAvailable()
    }
    assert(causes(e2).exists(c => Option(c.getMessage)
        .exists(_.contains("Unrecognized JSON kinesis.startingPosition"))),
      s"value-side latest was accepted: $e2")
  }
}
