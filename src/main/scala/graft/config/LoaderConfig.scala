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
    partitionFormat: Option[String] = None)

final case class BadOutput(
    path: String,
    maxRecordSize: Int = 1000000)

final case class LoaderConfig(
    purpose: Purpose,
    output: Output,
    bad: BadOutput,
    batching: Batching = Batching(),
    decompression: Decompression.Limits = Decompression.Limits(),
    checkpointLocation: Option[String] = None)

object LoaderConfig {

  /** Cross-field validation — enriched may only partition by date/time
    * tokens; SDJ defaults to "{vendor}.{schema}" (reference
    * DynamicPath.scala:38-51, ConfigSpec.scala:42-87).
    */
  def validate(c: LoaderConfig): Either[String, LoaderConfig] =
    DynamicPath
      .validatePartitionFormat(c.output.partitionFormat, c.purpose == Purpose.Enriched)
      .map(pf => c.copy(output = c.output.copy(partitionFormat = pf)))
}
