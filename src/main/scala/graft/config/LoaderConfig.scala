package graft.config

import scala.concurrent.duration._

import graft.sinks.DynamicPath
import graft.sources.Decompression

/** Typed config tree — same shape and defaults as the reference's HOCON
  * surface (reference Config.scala:38-92 and reference.conf:21-29), with
  * the same cross-field validation (Config.scala:122,
  * DynamicPath.scala:38-51).
  */
sealed trait Purpose
object Purpose {
  case object Enriched extends Purpose
  case object Sdj extends Purpose

  /** Decoder accepting the reference's spellings (Config.scala:109-114). */
  def parse(s: String): Either[String, Purpose] = s.toUpperCase match {
    case "ENRICHED_EVENTS" => Right(Enriched)
    case "SELF_DESCRIBING" => Right(Sdj)
    case other             => Left(s"Unknown purpose: $other")
  }
}

final case class Batching(
    maxBytes: Long = 64L * 1024 * 1024,
    maxDelay: FiniteDuration = 2.minutes)

final case class Output(
    path: String,
    prefix: String = "",
    partitionFormat: Option[String] = None,
    // true = deterministic object names per (batchId, partition, group):
    // a replayed micro-batch overwrites its own objects (exactly-once
    // OUTPUT on atomic-put stores) instead of duplicating them. Requires
    // a replay-stable partition path (no wall-clock tokens) to hold
    // across restarts; filenames drop the timestamp prefix.
    idempotentNames: Boolean = false)

final case class BadOutput(
    path: String,
    maxRecordSize: Int = 1000000,
    // per-emission chunk bounds (reference PutRecords limits,
    // config.aws.reference.hocon output.bad)
    recordLimit: Int = 500,
    byteLimit: Long = 5242880L)

final case class LoaderConfig(
    purpose: Purpose,
    output: Output,
    bad: BadOutput,
    batching: Batching = Batching(),
    decompression: Decompression.Limits = Decompression.Limits(),
    checkpointLocation: Option[String] = None)

final case class HealthProbeConfig(
    port: Int = 8000,
    unhealthyLatency: scala.concurrent.duration.FiniteDuration =
      scala.concurrent.duration.DurationInt(2).minutes)

object LoaderConfig {

  /** Cross-field validation — enriched may only partition by date/time
    * tokens; SDJ defaults to "{vendor}.{schema}" (reference
    * DynamicPath.scala:38-51, ConfigSpec.scala:42-87).
    */
  def validate(c: LoaderConfig): Either[String, LoaderConfig] =
    DynamicPath
      .validatePartitionFormat(c.output.partitionFormat, c.purpose == Purpose.Enriched)
      .map(pf => c.copy(output = c.output.copy(partitionFormat = pf)))

  /** Decode the reference's HOCON surface (config.aws.*.hocon shape) into
    * the typed tree, applying the reference.conf defaults
    * (reference modules/core/src/main/resources/reference.conf:19-42) and
    * the cross-field validation.
    */
  def fromHocon(
      text: String,
      env: String => Option[String] = sys.env.get): Either[String, LoaderConfig] = {
    val root =
      try Hocon.parse(text, env)
      catch { case e: Exception => return Left(s"HOCON parse error: ${e.getMessage}") }

    for {
      purposeStr <- root.str("purpose").toRight("Missing required field: purpose")
      purpose <- Purpose.parse(purposeStr)
      goodPath <- root.str("output", "good", "path")
        .orElse(root.str("output", "good"))
        .toRight("Missing required field: output.good.path")
      cfg <- validate(LoaderConfig(
        purpose = purpose,
        output = Output(
          path = goodPath,
          prefix = root.str("output", "good", "filenamePrefix").getOrElse(""),
          partitionFormat = root.str("output", "good", "partitionFormat"),
          idempotentNames = root.bool("output", "good", "idempotentNames")
            .getOrElse(false)),
        bad = BadOutput(
          path = root.str("output", "bad", "path")
            .orElse(root.str("output", "bad", "streamName")).getOrElse(""),
          maxRecordSize = root.num("output", "bad", "maxRecordSize")
            .map(_.toInt).getOrElse(1000000),
          recordLimit = root.num("output", "bad", "recordLimit")
            .map(_.toInt).getOrElse(500),
          byteLimit = root.num("output", "bad", "byteLimit")
            .map(_.toLong).getOrElse(5242880L)),
        batching = Batching(
          maxBytes = root.num("batching", "maxBytes")
            .map(_.toLong).getOrElse(64L * 1024 * 1024),
          maxDelay = root.duration("batching", "maxDelay")
            .getOrElse(scala.concurrent.duration.DurationInt(2).minutes)),
        decompression = Decompression.Limits(
          maxBytesInBatch = root.num("decompression", "maxBytesInBatch")
            .map(_.toLong).getOrElse(5242880L),
          maxBytesSinglePayload = root.num("decompression", "maxBytesSinglePayload")
            .map(_.toLong).getOrElse(10000000L))))
    } yield cfg
  }

  /** monitoring.metrics.statsd settings (reference
    * config.aws.reference.hocon metrics block); None when the block is
    * absent (metrics emission off).
    */
  def statsdFromHocon(text: String,
      env: String => Option[String] = sys.env.get)
      : Option[graft.streaming.MetricsEmitter.StatsdConfig] = {
    val root = Hocon.parse(text, env)
    root.str("monitoring", "metrics", "statsd", "hostname").map { host =>
      val tags = root.get("monitoring", "metrics", "statsd", "tags") match {
        case Some(o: Hocon.Obj) =>
          o.fields.keys.map(k => k -> o.str(k).getOrElse("")).toMap
        case _ => Map.empty[String, String]
      }
      graft.streaming.MetricsEmitter.StatsdConfig(
        hostname = host,
        port = root.num("monitoring", "metrics", "statsd", "port")
          .map(_.toInt).getOrElse(8125),
        tags = tags,
        period = root.duration("monitoring", "metrics", "statsd", "period")
          .getOrElse(scala.concurrent.duration.DurationInt(1).minute),
        prefix = root.str("monitoring", "metrics", "statsd", "prefix")
          .getOrElse("graft.loader"))
    }
  }

  /** Health-probe settings (reference reference.conf:39-42). */
  def healthProbeFromHocon(text: String,
      env: String => Option[String] = sys.env.get): HealthProbeConfig = {
    val root = Hocon.parse(text, env)
    HealthProbeConfig(
      port = root.num("monitoring", "healthProbe", "port").map(_.toInt).getOrElse(8000),
      unhealthyLatency = root.duration("monitoring", "healthProbe", "unhealthyLatency")
        .getOrElse(scala.concurrent.duration.DurationInt(2).minutes))
  }
}
