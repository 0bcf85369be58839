package graft.streaming

import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.config.{LoaderConfig, Purpose}
import graft.model.{BadRow, SchemaKey}
import graft.operators.EventParser
import graft.sinks.{BlobStore, RollingGzipWriter}
import graft.sources.Decompression

/** The loader dataflow — the Spark-native re-expression of the reference's
  * fixed pipeline (Processing.scala:69-77):
  *
  *   decompress → parse → good/bad split → grouped gzip write → metrics
  *
  * Stage mapping:
  *  - decompressedStream  → [[decode]] (Dataset.flatMap over binary rows)
  *  - parseBytes          → [[EventParser.parse]] (codegen'd column ops)
  *  - batchUpAndCompress  → micro-batch boundary + RollingGzipWriter
  *    (maxDelay ⇒ Trigger.ProcessingTime; maxBytes ⇒ compressed rolling)
  *  - writeToStorage      → salted repartition on (schema, salt) +
  *    per-partition rolling writes — the distributed analogue of the
  *    reference's parTraverse per group (Processing.scala:287-289), with
  *    the fan-out sized to the batch volume so one hot schema key (the
  *    enriched path maps EVERY event to atomic) cannot serialize the
  *    write stage on a single task
  *  - sendBadEvents       → size-capped bad-row JSON to the bad store
  *  - emitTokens          → Structured Streaming checkpoint commit: offsets
  *    commit only after foreachBatch returns ⇒ same at-least-once contract
  *    (reference Processing.scala:74-77,333-336)
  *
  * Batch mode falls out for free: [[runBatch]] applies the identical
  * transforms to a static DataFrame (an upgrade over the streaming-only
  * reference).
  */
object LoaderPipeline {

  /** Pluggable metrics (reference Metrics.scala:35-49): counts, stream
    * latency (micro-batch triggerExecution, via
    * [[MetricsEmitter.StreamLatencyListener]]) and e2e lag. Emission to
    * statsd/prometheus is [[MetricsEmitter]]'s job.
    */
  final class Metrics extends Serializable {
    val count = new AtomicLong(0)
    val badCount = new AtomicLong(0)
    val latencyMillis = new AtomicReference[Option[Long]](None)
    val e2eLatencyMillis = new AtomicReference[Option[Long]](None)
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[RollingGzipWriter.WriteAction]()
  }

  final case class RawRecord(payload: Array[Byte], decompressError: String)

  /** Decompression front-end: binary `value` column → one row per framed
    * record; corrupt frames become rows with a non-null error.
    */
  def decode(df: DataFrame, limits: Decompression.Limits): Dataset[RawRecord] = {
    import df.sparkSession.implicits._
    df.select(col("value").cast("binary")).as[Array[Byte]].flatMap { bytes =>
      val d = Decompression.decode(bytes, limits)
      d.records.map(RawRecord(_, null)) ++
        d.error.map(e => RawRecord(bytes, e))
    }
  }

  /** Full parse stage: decoded records → classified lines. */
  def parse(records: Dataset[RawRecord], purpose: Purpose): DataFrame = {
    val lines = records
      .withColumn("line", col("payload").cast("string"))
    val parsed = EventParser.parse(
      lines.filter(col("decompressError").isNull), purpose == Purpose.Enriched)
    val decompBad = lines.filter(col("decompressError").isNotNull)
      .withColumn("bad_error", col("decompressError"))
      .withColumn("vendor", lit(null).cast("string"))
      .withColumn("name", lit(null).cast("string"))
      .withColumn("format", lit(null).cast("string"))
      .withColumn("model", lit(null).cast("int"))
      .withColumn("collector_tstamp", lit(null).cast("timestamp"))
    parsed.unionByName(decompBad.select(parsed.columns.map(col).toSeq: _*))
  }

  /** One micro-batch (or one whole batch run): write grouped gzip objects,
    * bad rows, update metrics. `now` is injectable for deterministic tests
    * (reference tests pin the clock, ProcessingSpec e4).
    */
  def writeBatch(
      parsed: DataFrame,
      cfg: LoaderConfig,
      store: BlobStore,
      metrics: Metrics,
      now: () => Instant = () => Instant.now(),
      health: ServiceHealth = new ServiceHealth,
      batchId: Option[Long] = None): Unit = {
    import parsed.sparkSession.implicits._
    val wallClock = now()
    // deterministic object names per (batch, partition, group, file):
    // replays overwrite instead of duplicating (Output.idempotentNames)
    val nameSeed: Option[String] =
      if (cfg.output.idempotentNames) batchId.map(id => s"b$id") else None

    // One decode+parse materialization serves both writer jobs — without
    // this, the good write, and the bad write would each re-scan and
    // re-parse the entire batch (at 100 TB: two full extra passes).
    parsed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val good = EventParser.good(parsed)
        .select(col("vendor"), col("name"), col("format"), col("model"),
          col("line"), unix_micros(col("collector_tstamp")).as("ts_us"))

      val sinkCfg = RollingGzipWriter.SinkConfig(
        cfg.output.path, cfg.output.prefix, cfg.output.partitionFormat,
        cfg.batching.maxBytes, timestampedNames = nameSeed.isEmpty)

      // Size-adaptive write parallelism. Enriched batches all map to ONE
      // schema key (SURVEY §1.2), so keying the shuffle on schema alone
      // would funnel the whole batch through a single task — the defining
      // scale failure on a 1000-executor cluster. Instead, one cheap agg
      // over the (already persisted) batch estimates the compressed output
      // volume, and the shuffle key gains a salt sized so each task writes
      // roughly maxBytes. Small batches keep targetFiles=1, preserving the
      // reference's one-object-per-group-per-window behavior (T2/F14).
      val totalLineBytes: Long = Option(
        good.agg(sum(octet_length(col("line")))).first().get(0))
        .fold(0L)(_.asInstanceOf[Long])
      val maxTasks = math.max(1, parsed.sparkSession.sparkContext.defaultParallelism)
      val targetFiles: Int = math.min(
        maxTasks.toLong,
        totalLineBytes / EstGzipRatio / math.max(1L, cfg.batching.maxBytes) + 1).toInt

      // Count + earliest tstamp accumulate inside the write pass itself
      // (reference A2/A3, Processing.scala:108,167-173) — no stats pre-job.
      // The shuffle keys are plain columns (codegen'd hash partitioning, no
      // row-deserializing lambda); each partition then streams consecutive
      // same-schema runs straight into the rolling writer.
      // Per-service health (reference RuntimeService, Processing.scala:
      // 327-329): a failed write job degrades ONLY its sink's health flag;
      // a later success marks it healthy again.
      val actions: Array[RollingGzipWriter.WriteAction] =
        try {
          val a = good
            .withColumn("salt", pmod(hash(col("line")), lit(targetFiles)))
            .repartition(col("vendor"), col("name"), col("format"), col("model"),
              col("salt"))
            .sortWithinPartitions("vendor", "name", "format", "model")
            .mapPartitions { rows =>
              writePartition(rows, store, sinkCfg, wallClock, nameSeed)
            }
            .collect()
          health.markHealthy(ServiceHealth.BlobSink)
          a
        } catch { case e: Throwable =>
          health.markUnhealthy(ServiceHealth.BlobSink, String.valueOf(e.getMessage))
          throw e
        }

      actions.foreach(metrics.actions.add)
      metrics.count.addAndGet(actions.map(_.recordCount).sum)
      val earliest = actions.flatMap(_.minTstampMicros)
      if (earliest.nonEmpty) {
        metrics.e2eLatencyMillis.set(
          Some(wallClock.toEpochMilli - earliest.min / 1000))
      }
      try {
        writeBad(parsed, cfg, store, metrics, wallClock, nameSeed)
        health.markHealthy(ServiceHealth.BadSink)
      } catch { case e: Throwable =>
        health.markUnhealthy(ServiceHealth.BadSink, String.valueOf(e.getMessage))
        throw e
      }
    } finally parsed.unpersist()
  }

  /** Conservative gzip ratio for sizing the write fan-out: underestimating
    * compression means slightly more, smaller tasks — never a single fat one.
    */
  private val EstGzipRatio = 3L

  /** Stream one shuffle partition (sorted by schema key) into the rolling
    * writer: consecutive same-key runs each become their own writeGroup
    * call, so memory stays one gzip buffer regardless of partition size.
    */
  /** Deterministic per-run UUID factory for idempotent naming: named from
    * (seed=batchId, shuffle partition, schema key, file ordinal). Same
    * batch data + same partitioning ⇒ same names on replay.
    */
  private def uuidFactory(
      nameSeed: Option[String],
      key: (String, String, String, Int)): () => java.util.UUID =
    nameSeed match {
      case Some(seed) =>
        val base = s"$seed/p${org.apache.spark.TaskContext.getPartitionId()}/$key"
        var n = 0
        () => {
          n += 1
          java.util.UUID.nameUUIDFromBytes(
            s"$base/$n".getBytes(StandardCharsets.UTF_8))
        }
      case None => () => java.util.UUID.randomUUID()
    }

  private def writePartition(
      rows: Iterator[Row],
      store: BlobStore,
      sinkCfg: RollingGzipWriter.SinkConfig,
      wallClock: Instant,
      nameSeed: Option[String]): Iterator[RollingGzipWriter.WriteAction] = {
    if (rows.isEmpty) Iterator.empty
    else {
      val it = rows.buffered
      val s = it.head.schema
      val vIdx = s.fieldIndex("vendor"); val nIdx = s.fieldIndex("name")
      val fIdx = s.fieldIndex("format"); val mIdx = s.fieldIndex("model")
      val lIdx = s.fieldIndex("line"); val tIdx = s.fieldIndex("ts_us")
      def keyOf(r: Row) = (r.getString(vIdx), r.getString(nIdx),
        r.getString(fIdx), r.getInt(mIdx))
      Iterator.continually(()).takeWhile(_ => it.hasNext).flatMap { _ =>
        val key = keyOf(it.head)
        val run = new Iterator[(String, java.lang.Long)] {
          def hasNext: Boolean = it.hasNext && keyOf(it.head) == key
          def next(): (String, java.lang.Long) = {
            val r = it.next()
            (r.getString(lIdx),
              if (r.isNullAt(tIdx)) null else java.lang.Long.valueOf(r.getLong(tIdx)))
          }
        }
        // writeGroup drains `run` fully before the outer iterator advances
        RollingGzipWriter.writeGroup(
          store, sinkCfg, SchemaKey(key._1, key._2, key._3, key._4, 0, 0),
          wallClock, run, uuidFactory(nameSeed, key))
      }
    }
  }

  private def writeBad(
      parsed: DataFrame,
      cfg: LoaderConfig,
      store: BlobStore,
      metrics: Metrics,
      wallClock: Instant,
      nameSeed: Option[String] = None): Unit = {
    import parsed.sparkSession.implicits._

    // Bad rows: serialize with the size cap (reference P6,
    // BadRowsSerializer.scala:24-44). Written from executor tasks — one
    // object per non-empty partition — never collected to the driver
    // (the reference's bad sink also streams in chunks,
    // Processing.scala:315-331).
    val processor = BadRow.Processor("graft-loader", "0.1.0")
    val maxSize = cfg.bad.maxRecordSize
    val badPath = cfg.bad.path
    // Chunking contract (reference Processing.scala:315-331): the bad sink
    // bounds each emission to recordLimit records / byteLimit bytes — the
    // Kinesis PutRecords limits (config.aws.reference.hocon). Here each
    // chunk is one object: the byte bound applies to the compressed stream
    // (conservative — compressed ≤ raw), the record bound exactly.
    val badSinkCfg = RollingGzipWriter.SinkConfig(
      badPath, "bad-", None,
      math.min(cfg.batching.maxBytes, cfg.bad.byteLimit),
      cfg.bad.recordLimit.toLong, timestampedNames = nameSeed.isEmpty)
    val badWritten = EventParser.bad(parsed)
      .select(col("line"), col("bad_error"))
      .as[(String, String)]
      .mapPartitions { rows =>
        if (rows.isEmpty) Iterator.empty
        else {
          val jsons = rows.map { case (line, err) =>
            val row = BadRow.GenericError(
              processor, List(err),
              line.getBytes(StandardCharsets.UTF_8), wallClock)
            BadRow.sizeCapped(row, maxSize, wallClock, processor)
          }
          var n = 0L
          RollingGzipWriter.writeLines(
            store, badSinkCfg, SchemaKey.Atomic, wallClock,
            jsons.map { j => n += 1; j },
            uuidFactory(nameSeed, ("bad", "", "", 0)))
          Iterator.single(n)
        }
      }
      .collect()
    metrics.badCount.addAndGet(badWritten.sum)
  }

  /** Batch-mode entry: run the whole pipeline over a static DataFrame. */
  def runBatch(
      df: DataFrame,
      cfg: LoaderConfig,
      store: BlobStore,
      metrics: Metrics,
      now: () => Instant = () => Instant.now(),
      batchId: Option[Long] = None): Unit =
    writeBatch(parse(decode(df, cfg.decompression), cfg.purpose), cfg, store,
      metrics, now, batchId = batchId)

  /** Streaming entry: micro-batches flush at maxDelay — the reference's
    * time-bound batch emission (T3); offsets commit after each batch ⇒
    * at-least-once (T7).
    */
  def stream(
      df: DataFrame,
      cfg: LoaderConfig,
      store: BlobStore,
      metrics: Metrics,
      now: () => Instant = () => Instant.now(),
      health: ServiceHealth = new ServiceHealth): DataStreamWriter[Row] = {
    val w = df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(parse(decode(batch, cfg.decompression), cfg.purpose),
          cfg, store, metrics, now, health, batchId = Some(id))
      }
      .trigger(Trigger.ProcessingTime(cfg.batching.maxDelay.toMillis))
    cfg.checkpointLocation.fold(w)(p => w.option("checkpointLocation", p))
  }
}
