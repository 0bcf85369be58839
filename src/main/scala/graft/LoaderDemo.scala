package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config._
import graft.operators.Synth
import graft.sinks.HadoopBlobStore
import graft.streaming.LoaderPipeline

/** Demo/ops entrypoint: run the batch loader end-to-end over lines
  * synthesized from the events table, writing real gzip objects through
  * the production Hadoop blob store.
  *
  * Usage: runMain graft.LoaderDemo <sfDir> <outDir> [ENRICHED_EVENTS|SELF_DESCRIBING]
  */
object LoaderDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/loader_demo"
    val purpose = Purpose.parse(
      if (args.length > 2) args(2) else "SELF_DESCRIBING"
    ).fold(e => throw new IllegalArgumentException(e), identity)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val line = if (purpose == Purpose.Enriched) Synth.enrichedLine() else Synth.sdjLine()
    val raw = Synth.events(spark, sfDir)
      .select(encode(line, "utf-8").as("value"))

    val cfg = LoaderConfig.validate(LoaderConfig(
      purpose,
      Output(s"file://$outDir/good"),
      BadOutput(s"file://$outDir/bad"))).fold(e => throw new IllegalArgumentException(e), identity)

    val store = new HadoopBlobStore(Map.empty)
    val metrics = new LoaderPipeline.Metrics
    LoaderPipeline.runBatch(raw, cfg, store, metrics)

    println(s"[demo] good=${metrics.count.get()} bad=${metrics.badCount.get()} " +
      s"objects=${metrics.actions.size()} " +
      s"e2eLatencyMillis=${metrics.e2eLatencyMillis.get()}")
    metrics.actions.forEach(a =>
      println(s"[demo] wrote ${a.path} records=${a.recordCount} bytes=${a.compressedBytes}"))
    spark.stop()
  }
}
