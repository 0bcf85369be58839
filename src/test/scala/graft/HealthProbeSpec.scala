package graft

import java.net.{HttpURLConnection, URL}

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HealthProbe

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
}
