package graft

import java.io.ByteArrayInputStream
import java.time.Instant
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.sinks.InMemoryBlobStore
import graft.streaming.LoaderPipeline

/** End-to-end pipeline goldens — ports of reference ProcessingSpec e1–e4
  * against the in-memory recording store (the reference's MockEnvironment
  * analogue): written paths, decompressed content, counts, bad rows,
  * size-bound rolling.
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("pipeline-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val fixedNow = Instant.parse("1970-01-01T00:00:00Z")

  private def gunzip(b: Array[Byte]): String =
    new String(new GZIPInputStream(new ByteArrayInputStream(b)).readAllBytes())

  /** 131-column-ish minimal enriched TSV with collector_tstamp at index 3
    * (FIXTURES.md §1).
    */
  private def tsv(ts: String): String =
    s"app\tweb\t\t$ts\t\tpage_view\tid-1"

  private def rawDf(payloads: Seq[String]): DataFrame = {
    import spark.implicits._
    payloads.map(_.getBytes("UTF-8")).toDF("value")
  }

  private def run(cfg: LoaderConfig, payloads: Seq[String]):
      (InMemoryBlobStore, LoaderPipeline.Metrics) = {
    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics
    LoaderPipeline.runBatch(rawDf(payloads), cfg, store, metrics, () => fixedNow)
    (store, metrics)
  }

  test("e1: enriched happy path — one gzip file, content = line\\nline\\n, count metric") {
    val cfg = LoaderConfig(Purpose.Enriched, Output("mem://path"), BadOutput("mem://bad"))
    val lines = Seq(tsv("1970-01-01 00:00:42.000"), tsv("1970-01-01 00:00:43.000"))
    val (store, metrics) = run(cfg, lines)

    assert(store.paths.size == 1)
    // enriched default: no partition subdir; filename <ts>-<uuid>.gz
    assert(store.paths.head.matches(
      "mem://path/1970-01-01-000000-[0-9a-f-]{36}\\.gz"))
    val content = gunzip(store.objects.get(store.paths.head))
    assert(content == lines.mkString("", "\n", "\n"))
    assert(metrics.count.get() == 2)
    assert(metrics.badCount.get() == 0)
    // e2e latency from min collector_tstamp (42 s before "now" = epoch)
    assert(metrics.e2eLatencyMillis.get().contains(-42000L))
  }

  test("enriched edge rows: <4 columns or garbage tstamp → NULL, silently good (reference Processing.scala:147-153)") {
    val cfg = LoaderConfig(Purpose.Enriched, Output("mem://path"), BadOutput("mem://bad"))
    val lines = Seq(
      "only\ttwo",                       // fewer than 4 columns
      "a\tb\tc\tnot-a-timestamp\te",     // unparsable tstamp
      tsv("1970-01-01 00:00:05.000"),    // good tstamp, 3 fraction digits
      tsv("1970-01-01 00:00:03.5"),      // 1 fraction digit (Instant.parse
      tsv("1970-01-01 00:00:07.123456")) // and 6 both parse, P2 parity)
    val (store, metrics) = run(cfg, lines)
    // all rows are GOOD (written), none bad; e2e latency from the earliest
    // PARSABLE tstamp — the 1-digit-fraction row
    assert(metrics.count.get() == 5)
    assert(metrics.badCount.get() == 0)
    assert(metrics.e2eLatencyMillis.get().contains(-3500L))
    val content = store.paths.filter(_.startsWith("mem://path"))
      .map(p => gunzip(store.objects.get(p))).mkString
    assert(content.linesIterator.size == 5)
  }

  test("e2: SDJ grouping by schema + bad rows (reference ProcessingSpec:80-101)") {
    val cfg = LoaderConfig.validate(LoaderConfig(
      Purpose.Sdj, Output("mem://path"), BadOutput("mem://bad"))).toOption.get
    val payloads = Seq(
      """{"schema":"iglu:com.example/event1/jsonschema/1-0-0","data":{"f":"v1"}}""",
      """{"schema":"iglu:com.example/event2/jsonschema/1-0-0","data":{"f":"v2"}}""",
      """{"schema":"iglu:com.example/event1/jsonschema/1-0-0","data":{"f":"v3"}}""",
      """{"data":{"f":"no-schema"}}""",
      """not json at all""")
    val (store, metrics) = run(cfg, payloads)

    val good = store.paths.filter(_.startsWith("mem://path"))
    assert(good.size == 2) // one file per schema group
    assert(good.exists(_.contains("/com.example.event1/")))
    assert(good.exists(_.contains("/com.example.event2/")))
    val e1 = good.find(_.contains("event1")).get
    assert(gunzip(store.objects.get(e1)).linesIterator.size == 2)
    assert(metrics.count.get() == 3)
    assert(metrics.badCount.get() == 2)

    val badPaths = store.paths.filter(_.startsWith("mem://bad"))
    assert(badPaths.nonEmpty)
    val badContent = badPaths.map(p => gunzip(store.objects.get(p))).mkString
    assert(badContent.contains("Can't parse JSON holding self-describing event"))
    assert(badContent.contains("Can't extract schema from self-describing event"))
    // payload is Base64 of the raw bytes (reference Processing.scala:198)
    assert(badContent.contains(
      java.util.Base64.getEncoder.encodeToString("not json at all".getBytes)))
  }

  test("e3: size-bound rolling — compressed maxBytes splits output files") {
    val cfg = LoaderConfig(Purpose.Enriched, Output("mem://path"),
      BadOutput("mem://bad"), Batching(maxBytes = 150))
    // incompressible-ish distinct lines so gzip size grows per record
    val lines = (0 until 8).map(i => tsv(f"1970-01-01 00:00:$i%02d.000") + s"-${i * 7919}")
    val (store, metrics) = run(cfg, lines)
    assert(store.paths.size > 1) // rolled at least once
    val all = store.paths.flatMap(p => gunzip(store.objects.get(p)).linesIterator)
    assert(all.toSet == lines.toSet) // no loss, no duplication
    assert(metrics.count.get() == 8)
  }

  test("salted write fan-out: a large single-schema batch writes from multiple tasks") {
    // maxBytes high enough that the rolling writer alone would emit ONE
    // object — any extra objects can only come from the salted fan-out.
    val cfg = LoaderConfig(Purpose.Enriched, Output("mem://path"),
      BadOutput("mem://bad"), Batching(maxBytes = 2000))
    val lines = (0 until 200).map(i =>
      tsv(f"1970-01-01 00:${i / 60}%02d:${i % 60}%02d.000") + s"-pad-${i * 7919}")
    val (store, metrics) = run(cfg, lines)

    // every event maps to the atomic schema, yet >1 object was written —
    // the enriched hot key no longer serializes on one task
    assert(store.paths.size > 1)
    val all = store.paths.flatMap(p => gunzip(store.objects.get(p)).linesIterator)
    assert(all.toSet == lines.toSet) // no loss, no duplication across salts
    assert(all.size == 200)
    assert(metrics.count.get() == 200)
    assert(metrics.e2eLatencyMillis.get().contains(0L)) // min ts = epoch
  }

  test("e4/streaming: MemoryStream micro-batches flush through foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Array[Byte]]
    val cfg = LoaderConfig(Purpose.Enriched, Output("mem://path"),
      BadOutput("mem://bad"),
      checkpointLocation = Some(
        java.nio.file.Files.createTempDirectory("ckpt").toString))
    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics

    val q = LoaderPipeline.stream(
      mem.toDF(), cfg, store, metrics, () => fixedNow).start()
    try {
      mem.addData(tsv("1970-01-01 00:00:01.000").getBytes)
      q.processAllAvailable()
      assert(metrics.count.get() == 1)
      val afterFirst = store.paths.size
      assert(afterFirst >= 1)
      mem.addData(tsv("1970-01-01 00:00:02.000").getBytes)
      q.processAllAvailable()
      assert(metrics.count.get() == 2)
      assert(store.paths.size > afterFirst) // second batch → new object
    } finally q.stop()
  }

  test("T7 ack contract: restart from checkpoint skips committed batches; replay duplicates, never gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Array[Byte]]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-replay").toString
    val cfg = LoaderConfig(Purpose.Enriched, Output("mem://path"),
      BadOutput("mem://bad"), checkpointLocation = Some(ckpt))
    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics

    val q1 = LoaderPipeline.stream(
      mem.toDF(), cfg, store, metrics, () => fixedNow).start()
    mem.addData(tsv("1970-01-01 00:00:01.000").getBytes)
    q1.processAllAvailable()
    q1.stop()
    assert(metrics.count.get() == 1)

    // restart against the same checkpoint: the committed batch must NOT
    // reprocess (offsets acked only after the write completed)
    val q2 = LoaderPipeline.stream(
      mem.toDF(), cfg, store, metrics, () => fixedNow).start()
    try {
      mem.addData(tsv("1970-01-01 00:00:02.000").getBytes)
      q2.processAllAvailable()
      assert(metrics.count.get() == 2) // would be 3 if batch 1 replayed
    } finally q2.stop()

    // at-least-once on manual re-run of the same batch: duplicate OBJECTS
    // appear (new UUIDs), data is never lost
    val before = store.paths.size
    LoaderPipeline.runBatch(
      rawDf(Seq(tsv("1970-01-01 00:00:03.000"))), cfg, store, metrics, () => fixedNow)
    LoaderPipeline.runBatch(
      rawDf(Seq(tsv("1970-01-01 00:00:03.000"))), cfg, store, metrics, () => fixedNow)
    assert(store.paths.size == before + 2) // two distinct UUID objects
  }

  test("bad sink chunking: recordLimit bounds each bad object (reference PutRecords limits)") {
    val cfg = LoaderConfig.validate(LoaderConfig(
      Purpose.Sdj, Output("mem://path"),
      BadOutput("mem://bad", recordLimit = 2))).toOption.get
    // 7 unparsable payloads → bad rows; recordLimit=2 → no object holds >2
    val payloads = (0 until 7).map(i => s"not json $i")
    val (store, metrics) = run(cfg, payloads)
    assert(metrics.badCount.get() == 7)
    val badPaths = store.paths.filter(_.startsWith("mem://bad"))
    val sizes = badPaths.map(p => gunzip(store.objects.get(p)).linesIterator.size)
    assert(sizes.sum == 7)
    assert(sizes.forall(_ <= 2))
  }

  test("idempotent naming: a replayed batch overwrites its own objects, never duplicates") {
    val cfg = LoaderConfig(Purpose.Enriched,
      Output("mem://path", idempotentNames = true), BadOutput("mem://bad"))
    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics
    val lines = Seq(tsv("1970-01-01 00:00:01.000"), tsv("1970-01-01 00:00:02.000"))
    LoaderPipeline.runBatch(rawDf(lines), cfg, store, metrics, () => fixedNow,
      batchId = Some(7L))
    val first = store.paths
    assert(first.nonEmpty)
    assert(first.forall(_.matches("mem://path/[0-9a-f-]{36}\\.gz"))) // no ts prefix

    // same batch id replayed → identical names, content overwritten in place
    LoaderPipeline.runBatch(rawDf(lines), cfg, store, metrics, () => fixedNow,
      batchId = Some(7L))
    assert(store.paths == first)

    // a DIFFERENT batch id is new data → new objects
    LoaderPipeline.runBatch(rawDf(lines), cfg, store, metrics, () => fixedNow,
      batchId = Some(8L))
    assert(store.paths.size == first.size * 2)

    // default (UUID) mode still duplicates on replay — at-least-once
    val cfg2 = cfg.copy(output = cfg.output.copy(idempotentNames = false))
    val store2 = new InMemoryBlobStore
    LoaderPipeline.runBatch(rawDf(lines), cfg2, store2, metrics, () => fixedNow,
      batchId = Some(7L))
    val n2 = store2.paths.size
    LoaderPipeline.runBatch(rawDf(lines), cfg2, store2, metrics, () => fixedNow,
      batchId = Some(7L))
    assert(store2.paths.size == n2 * 2)
  }

  test("decompression errors become bad rows end-to-end") {
    val cfg = LoaderConfig(Purpose.Enriched, Output("mem://path"), BadOutput("mem://bad"))
    val store = new InMemoryBlobStore
    val metrics = new LoaderPipeline.Metrics
    import spark.implicits._
    val junk: Array[Byte] = Array(0x28, 0xb5.toByte, 0x2f, 0xfd.toByte, 9, 9, 9)
    val df = Seq(junk).toDF("value")
    LoaderPipeline.runBatch(df, cfg, store, metrics, () => fixedNow)
    assert(metrics.badCount.get() == 1)
    val badContent = store.paths.filter(_.startsWith("mem://bad"))
      .map(p => gunzip(store.objects.get(p))).mkString
    assert(badContent.contains("Could not decompress"))
  }
}
