package graft.sinks

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.UUID

import graft.model.SchemaKey

/** Output-path templating — renders the partitioned, templated object path
  * for each (schema, batch) group.
  *
  * Template grammar (reference: DynamicPath.scala:24-32,54-108):
  *   time tokens   {yyyy} {MM} {dd} {HH} {mm} {ss}          (UTC)
  *   schema tokens {vendor} {schema} {name} {format} {model}  ({schema}≡{name})
  * The atomic (enriched) schema leaves schema tokens UNsubstituted
  * (reference: DynamicPath.scala:85-87). Repeated occurrences of a token are
  * all substituted. Filename: <prefix><yyyy-MM-dd-HHmmss>-<uuid>.gz with
  * `//` collapsed and trailing slashes normalized
  * (reference: DynamicPath.scala:61-69,103-108).
  */
object DynamicPath {

  private val fileTsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd-HHmmss").withZone(ZoneOffset.UTC)

  private def two(i: Int): String = f"$i%02d"

  /** Substitute time + schema tokens in a partition-format template. */
  def renderPartition(template: String, now: Instant, schema: SchemaKey): String = {
    val utc = now.atZone(ZoneOffset.UTC)
    var s = template
      .replace("{yyyy}", utc.getYear.toString)
      .replace("{MM}", two(utc.getMonthValue))
      .replace("{dd}", two(utc.getDayOfMonth))
      .replace("{HH}", two(utc.getHour))
      .replace("{mm}", two(utc.getMinute))
      .replace("{ss}", two(utc.getSecond))
    // Atomic (enriched) schema: leave schema tokens literal.
    if (schema != SchemaKey.Atomic) {
      s = s
        .replace("{vendor}", schema.vendor)
        .replace("{schema}", schema.name)
        .replace("{name}", schema.name)
        .replace("{format}", schema.format)
        .replace("{model}", schema.model.toString)
    }
    s
  }

  /** Collapse duplicate slashes and trim leading/trailing slashes per segment
    * joining; preserves a scheme prefix like `s3://`.
    */
  def joinPath(parts: Seq[String]): String = {
    val joined = parts.filter(_.nonEmpty).mkString("/")
    val (scheme, rest) = joined.indexOf("://") match {
      case -1 => ("", joined)
      case i  => (joined.substring(0, i + 3), joined.substring(i + 3))
    }
    scheme + rest.replaceAll("/{2,}", "/").stripSuffix("/")
  }

  def baseFileName(prefix: String, now: Instant, uuid: UUID): String =
    s"$prefix${fileTsFmt.format(now)}-$uuid.gz"

  /** Full object path for one (schema, batch) group. `timestamped = false`
    * drops the wall-clock filename prefix — the idempotent-naming mode,
    * where the (deterministic) uuid alone must name the object so a
    * replayed batch overwrites rather than duplicates.
    */
  def getFullPath(
      basePath: String,
      prefix: String,
      partitionFormat: Option[String],
      now: Instant,
      schema: SchemaKey,
      uuid: UUID = UUID.randomUUID(),
      timestamped: Boolean = true
  ): String = {
    val partition = partitionFormat.map(renderPartition(_, now, schema)).getOrElse("")
    val name =
      if (timestamped) baseFileName(prefix, now, uuid) else s"$prefix$uuid.gz"
    joinPath(Seq(basePath, partition, name))
  }

  /** Config cross-validation: enriched purpose may only partition by
    * date/time tokens (reference: DynamicPath.scala:38-51). SDJ purpose
    * defaults to "{vendor}.{schema}" when unset.
    */
  private val schemaTokens = Seq("{vendor}", "{schema}", "{name}", "{format}", "{model}")

  def validatePartitionFormat(format: Option[String], enriched: Boolean): Either[String, Option[String]] =
    format match {
      case Some(f) if enriched && schemaTokens.exists(f.contains) =>
        Left("Enriched events can only get partitioned by date and time")
      case Some(f) => Right(Some(f))
      case None    => Right(if (enriched) None else Some("{vendor}.{schema}"))
    }
}
