package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.SchemaKey

/** Line classification + key/timestamp extraction (reference operators
  * P1–P5), expressed as declarative column transforms so Catalyst codegens
  * the whole parse stage.
  *
  * Input: a DataFrame with a `line: string` column (already UTF-8 decoded,
  * reference Processing.scala:102,116).
  *
  * Output columns:
  *   vendor/name/format/model — grouping key (atomic sentinel for enriched)
  *   collector_tstamp         — event time, NULL on malformed (silent,
  *                              reference Processing.scala:152)
  *   bad_error                — NULL for good rows; error message for bad
  *                              (reference Processing.scala:181-182)
  */
object EventParser {

  val IgluRegex: String = Synth.IgluRegex

  /** Enriched purpose: TSV, collector_tstamp at split index 3, format
    * `yyyy-MM-dd HH:mm:ss[.SSS]`; every row maps to the atomic schema and
    * none are bad (reference foldEnriched Processing.scala:101-112).
    */
  def parseEnriched(lines: DataFrame): DataFrame = {
    val a = SchemaKey.Atomic
    lines
      .withColumn("vendor", lit(a.vendor))
      .withColumn("name", lit(a.name))
      .withColumn("format", lit(a.format))
      .withColumn("model", lit(a.model))
      // get() (0-based) instead of element_at: ANSI mode (Spark 4 default)
      // makes element_at THROW on rows with fewer than 4 columns, but the
      // reference treats short/malformed rows as silent NULL tstamps
      // (Processing.scala:147-153). try_to_timestamp likewise swallows
      // unparsable text instead of raising under ANSI. The optional
      // 9-'S' fraction accepts 1–9 digits on parse — the reference's
      // Instant.parse width (Processing.scala:150-152); "[.SSS]" would
      // silently NULL a valid "…:05.5".
      .withColumn("collector_tstamp",
        try_to_timestamp(get(split(col("line"), "\t", -1), lit(3)),
          lit("yyyy-MM-dd HH:mm:ss[.SSSSSSSSS]")))
      .withColumn("bad_error", lit(null).cast("string"))
  }

  /** SDJ purpose: parse `$.schema`, extract the Iglu key; malformed JSON or
    * non-Iglu schema ⇒ bad row with the reference's message prefixes
    * (Processing.scala:181-182; golden ProcessingSpec.scala:315-319).
    */
  def parseSdj(lines: DataFrame): DataFrame = {
    val uri = get_json_object(col("line"), "$.schema")
    val jsonOk = when(col("line").rlike("^\\s*\\{"), true).otherwise(false)
    lines
      .withColumn("u", uri)
      .withColumn("bad_error",
        when(!jsonOk, lit("Can't parse JSON holding self-describing event"))
          .when(col("u").isNull || !col("u").rlike(IgluRegex),
            lit("Can't extract schema from self-describing event: INVALID_IGLUURI"))
          .otherwise(lit(null).cast("string")))
      // extraction is split/substring over the already-validated URI — the
      // rlike above is the single regex pass per line; regexp_extract ×4
      // measured ~10× slower at sf0.1
      .withColumn("parts", when(col("bad_error").isNull,
        split(substring(col("u"), 6, Int.MaxValue), "/")))
      .withColumn("vendor", col("parts").getItem(0))
      .withColumn("name", col("parts").getItem(1))
      .withColumn("format", col("parts").getItem(2))
      .withColumn("model",
        split(col("parts").getItem(3), "-").getItem(0).cast("int"))
      .withColumn("collector_tstamp", lit(null).cast("timestamp"))
      .drop("u", "parts")
  }

  def parse(lines: DataFrame, enriched: Boolean): DataFrame =
    if (enriched) parseEnriched(lines) else parseSdj(lines)

  /** Good/bad routing — two filters over one parsed plan (reference P4,
    * Processing.scala:118-134). Catalyst shares the scan via plan reuse.
    */
  def good(parsed: DataFrame): DataFrame = parsed.filter(col("bad_error").isNull)
  def bad(parsed: DataFrame): DataFrame = parsed.filter(col("bad_error").isNotNull)
}
