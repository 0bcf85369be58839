package graft.sinks

import java.io.ByteArrayOutputStream
import java.time.Instant
import java.util.UUID
import java.util.zip.GZIPOutputStream

import scala.collection.mutable.ArrayBuffer

import graft.model.SchemaKey

/** Rolling gzip batch writer (reference operators T2 + F14 + S5).
  *
  * Semantics preserved from the reference:
  *  - file content = each line + '\n', concatenated in arrival order,
  *    gzip-compressed (CompressedStream.scala:27-33; golden
  *    ProcessingSpec.scala:71 expects "line\nline\n")
  *  - the size bound is a soft limit on COMPRESSED bytes, checked after
  *    append — a file may overshoot by one record (Processing.scala:249)
  *  - every file gets a templated partition path + UUID filename
  *    (DynamicPath.scala:54-108)
  *
  * Scale note: the reference bounds the whole in-flight batch because it
  * is a single-node loader; here each (schema-group × task) rolls its own
  * files, which is the property that actually matters at 1000 executors —
  * no coordination, bounded memory per task (one gzip buffer).
  */
object RollingGzipWriter {

  final case class WriteAction(
      path: String,
      recordCount: Long,
      compressedBytes: Long,
      minTstampMicros: Option[Long] = None)

  final case class SinkConfig(
      basePath: String,
      prefix: String = "",
      partitionFormat: Option[String] = None,
      maxBytes: Long = 64L * 1024 * 1024,
      // record-count bound per object — the bad sink's chunking contract
      // (reference recordLimit=500 per PutRecords request,
      // Processing.scala:315-331); Long.MaxValue = unbounded (good output)
      maxRecords: Long = Long.MaxValue,
      // false = idempotent naming: no wall-clock prefix in filenames, the
      // (deterministic) uuid alone names the object
      timestampedNames: Boolean = true)

  /** Write one schema-group's lines, rolling to a new object whenever the
    * current gzip stream's byte count passes maxBytes. Returns one action
    * per object written.
    *
    * Count and min-event-time metrics accumulate in this same pass (the
    * second element of each record; null = no event time), so the caller
    * never needs a separate aggregation job over the batch — at 100 TB a
    * stats pre-pass would be a second full scan+parse of the input.
    */
  def writeGroup(
      store: BlobStore,
      cfg: SinkConfig,
      schema: SchemaKey,
      now: Instant,
      records: Iterator[(String, java.lang.Long)],
      newUuid: () => UUID = () => UUID.randomUUID()): Seq[WriteAction] = {
    val actions = ArrayBuffer.empty[WriteAction]
    var buf: ByteArrayOutputStream = null
    var gz: GZIPOutputStream = null
    var count = 0L
    var minTs = Long.MaxValue

    def open(): Unit = {
      buf = new ByteArrayOutputStream(64 * 1024)
      gz = new GZIPOutputStream(buf, true)
      count = 0L
      minTs = Long.MaxValue
    }
    def flush(): Unit = if (count > 0) {
      gz.close()
      val bytes = buf.toByteArray
      val path = DynamicPath.getFullPath(
        cfg.basePath, cfg.prefix, cfg.partitionFormat, now, schema, newUuid(),
        cfg.timestampedNames)
      store.write(path, bytes)
      actions += WriteAction(path, count, bytes.length.toLong,
        if (minTs == Long.MaxValue) None else Some(minTs))
    }

    open()
    records.foreach { case (line, tsUs) =>
      gz.write(line.getBytes("UTF-8"))
      gz.write('\n')
      gz.flush() // syncFlush — keeps buf.size() an honest compressed count
      count += 1
      if (tsUs != null && tsUs < minTs) minTs = tsUs
      if (buf.size() > cfg.maxBytes || count >= cfg.maxRecords) { flush(); open() }
    }
    flush()
    actions.toSeq
  }

  /** Convenience for callers without per-record event time. */
  def writeLines(
      store: BlobStore,
      cfg: SinkConfig,
      schema: SchemaKey,
      now: Instant,
      lines: Iterator[String],
      newUuid: () => UUID = () => UUID.randomUUID()): Seq[WriteAction] =
    writeGroup(store, cfg, schema, now,
      lines.map(l => (l, null: java.lang.Long)), newUuid)
}
