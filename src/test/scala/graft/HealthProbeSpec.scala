package graft

import java.net.{HttpURLConnection, URL}

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ErrorReporter, HealthProbe, LoaderPipeline, MetricsEmitter, ServiceHealth}

/** Liveness probe semantics (reference T9): healthy only while progress
  * events keep arriving within unhealthyLatency; HTTP surface returns
  * 200/503 accordingly.
  */
class HealthProbeSpec extends AnyFunSuite {

  private def get(port: Int): (Int, String) = {
    val conn = new URL(s"http://localhost:$port/health")
      .openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val body = scala.io.Source.fromInputStream(
      if (code >= 400) conn.getErrorStream else conn.getInputStream).mkString
    (code, body)
  }

  test("unstarted probe is unhealthy; progress flips it healthy; staleness flips it back") {
    val port = 18765
    val probe = new HealthProbe(unhealthyLatency = 200.millis, port = port).start()
    try {
      val (code1, body1) = get(port)
      assert(code1 == 503)
      assert(body1.contains("\"healthy\":false"))

      probe.onQueryStarted(null)
      probe.onQueryProgress(null)
      val (code2, body2) = get(port)
      assert(code2 == 200)
      assert(body2.contains("\"healthy\":true"))

      Thread.sleep(300) // exceed unhealthyLatency with no progress
      val (code3, _) = get(port)
      assert(code3 == 503)
    } finally probe.stop()
  }

  test("per-service health: one degraded sink flips the probe; recovery flips it back") {
    val port = 18766
    val services = new ServiceHealth
    val probe = new HealthProbe(unhealthyLatency = 1.hour, port = port,
      services = services).start()
    try {
      probe.onQueryStarted(null)
      probe.onQueryProgress(null)
      assert(get(port)._1 == 200)

      services.markUnhealthy(ServiceHealth.BadSink, "put failed")
      val (code, body) = get(port)
      assert(code == 503)
      assert(body.contains(""""BadSink":"put failed""""))

      services.markHealthy(ServiceHealth.BadSink)
      assert(get(port)._1 == 200)
    } finally probe.stop()
  }

  test("error-report hook: a terminally-failed stream surfaces a structured lastError and a statsd error counter") {
    val port = 18768
    val udp = new java.net.DatagramSocket() // ephemeral receiver
    udp.setSoTimeout(10000)
    val reporter = new ErrorReporter(Some(MetricsEmitter.StatsdConfig(
      "localhost", udp.getLocalPort)))
    val probe = new HealthProbe(unhealthyLatency = 1.hour, port = port,
      errors = Some(reporter)).start()
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.streams.addListener(reporter)
    spark.streams.addListener(probe)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
      mem.addData(1)
      val q = mem.toDF().writeStream.queryName("failing-loader")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new IllegalStateException("sink exploded")
        }.start()
      intercept[Exception](q.awaitTermination())

      // the listener bus delivers asynchronously — poll for the report
      val deadline = System.currentTimeMillis() + 10000
      while (reporter.lastError.get().isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val report = reporter.lastError.get()
        .getOrElse(fail("no error report captured"))
      assert(report.queryName == "failing-loader")
      assert(report.exceptionClass.nonEmpty)
      assert(report.batchId >= -1L)

      // /health: 503 with the structured lastError payload
      val (code, body) = get(port)
      assert(code == 503)
      assert(body.contains(""""lastError":{"query":"failing-loader""""))
      assert(body.contains(report.exceptionClass.replace("\\", "")))

      // the statsd counter datagram arrived with query+exception tags
      val packet = new java.net.DatagramPacket(new Array[Byte](2048), 2048)
      udp.receive(packet)
      val line = new String(packet.getData, 0, packet.getLength)
      assert(line.startsWith("graft.loader.stream_error:1|c"))
      assert(line.contains("query:failing-loader"))
      assert(line.contains("exception:"))
    } finally {
      probe.stop(); reporter.close(); udp.close(); spark.stop()
    }
  }

  test("error-report hook: restarting the failed query clears lastError") {
    val reporter = new ErrorReporter()
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.streams.addListener(reporter)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
      mem.addData(1)
      val q = mem.toDF().writeStream.queryName("flaky-loader")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new IllegalStateException("transient")
        }.start()
      intercept[Exception](q.awaitTermination())
      val deadline = System.currentTimeMillis() + 10000
      while (reporter.lastError.get().isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(reporter.lastError.get().nonEmpty)

      // recovered: same query name restarts cleanly → report cleared
      val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
      mem2.addData(2)
      val q2 = mem2.toDF().writeStream.queryName("flaky-loader")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      q2.processAllAvailable()
      val d2 = System.currentTimeMillis() + 10000
      while (reporter.lastError.get().nonEmpty &&
        System.currentTimeMillis() < d2) Thread.sleep(50)
      assert(reporter.lastError.get().isEmpty)
      q2.stop()
    } finally { reporter.close(); spark.stop() }
  }

  test("GET /metrics serves the prometheus scrape when built with metrics") {
    val port = 18767
    val metrics = new LoaderPipeline.Metrics
    metrics.count.set(42)
    metrics.e2eLatencyMillis.set(Some(7000L))
    val probe = new HealthProbe(port = port, metrics = Some(metrics)).start()
    try {
      val conn = new URL(s"http://localhost:$port/metrics")
        .openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = scala.io.Source.fromInputStream(conn.getInputStream).mkString
      assert(body.contains("# TYPE graft_count counter"))
      assert(body.contains("graft_count 42"))
      assert(body.contains("graft_e2e_latency_millis 7000"))
      assert(body.contains("graft_latency_collector_to_load 7"))
    } finally probe.stop()
  }
}
