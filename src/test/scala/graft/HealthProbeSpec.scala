package graft

import java.net.{HttpURLConnection, URL}

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{HealthProbe, LoaderPipeline, ServiceHealth}

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
