package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source construction (reference operator S1). The reference consumes
  * Kinesis via the KCL (config surface at
  * config/config.aws.reference.hocon:7-64); in Spark the same stream
  * arrives as a streaming DataFrame with a binary `value` column — the
  * shape shared by the Kafka source, Kinesis DSv2 connectors, and the
  * in-repo file/memory sources. Everything downstream of [[build]] is
  * source-agnostic.
  */
object RecordSources {

  sealed trait SourceConfig

  /** Kinesis (production): requires a Kinesis DSv2 connector on the
    * classpath (e.g. spark-sql-kinesis). Options mirror the reference's
    * polling surface: maxRecords per poll, idle time between reads,
    * initial position.
    */
  final case class Kinesis(
      streamName: String,
      region: String,
      initialPosition: String = "LATEST",
      maxRecords: Int = 750,
      idleTimeBetweenReadsMs: Long = 1500,
      connectorFormat: String = "aws-kinesis") extends SourceConfig

  /** Kafka: built-in connector, value column already binary. */
  final case class Kafka(bootstrapServers: String, topic: String)
      extends SourceConfig

  /** Line files (text): each line becomes one record payload — the batch
    * backfill / replay path.
    */
  final case class TextFiles(path: String, streaming: Boolean = true)
      extends SourceConfig

  def build(spark: SparkSession, conf: SourceConfig): DataFrame = conf match {
    case k: Kinesis =>
      spark.readStream
        .format(k.connectorFormat)
        .option("streamName", k.streamName)
        .option("region", k.region)
        .option("initialPosition", k.initialPosition)
        .option("maxFetchRecordsPerShard", k.maxRecords.toString)
        .option("minFetchPeriodMillis", k.idleTimeBetweenReadsMs.toString)
        .load()
        .select(col("data").cast("binary").as("value"))
    case k: Kafka =>
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", k.bootstrapServers)
        .option("subscribe", k.topic)
        .load()
        .select(col("value"))
    case t: TextFiles =>
      val reader =
        if (t.streaming) spark.readStream.format("text").load(t.path)
        else spark.read.format("text").load(t.path)
      reader.select(encode(col("value"), "utf-8").as("value"))
  }
}
