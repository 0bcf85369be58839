package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

import scala.concurrent.duration._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Liveness probe (reference operator T9 — Environment.scala:71-74,
  * HealthProbe on :8000 with unhealthyLatency=2min): the engine is healthy
  * while micro-batches keep completing; if no progress lands within
  * `unhealthyLatency`, or the query terminates with an error, the probe
  * flips to 503.
  *
  * Implemented as a StreamingQueryListener (the Spark-native signal — a
  * progress event per micro-batch) plus the JDK's built-in HTTP server.
  */
final class HealthProbe(unhealthyLatency: FiniteDuration = 2.minutes,
    port: Int = 8000) extends StreamingQueryListener {

  private val lastProgressMs = new AtomicReference[Option[Long]](None)
  private val terminated = new AtomicReference[Option[String]](None)
  private val started = new AtomicReference[Boolean](false)
  private var server: HttpServer = _

  override def onQueryStarted(e: QueryStartedEvent): Unit = {
    started.set(true)
    lastProgressMs.set(Some(System.currentTimeMillis()))
  }

  override def onQueryProgress(e: QueryProgressEvent): Unit =
    lastProgressMs.set(Some(System.currentTimeMillis()))

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    terminated.set(Some(e.exception.getOrElse("clean shutdown")))

  /** Healthy = started, not errored, and progressed recently. */
  def healthy: Boolean =
    started.get() && terminated.get().isEmpty &&
      lastProgressMs.get().exists(t =>
        System.currentTimeMillis() - t < unhealthyLatency.toMillis)

  def status: String = {
    val age = lastProgressMs.get()
      .map(t => System.currentTimeMillis() - t).getOrElse(-1L)
    s"""{"healthy":$healthy,"lastProgressAgeMs":$age,""" +
      s""""terminated":${terminated.get().map("\"" + _ + "\"").getOrElse("null")}}"""
  }

  def start(): HealthProbe = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/health", (ex: HttpExchange) => {
      val body = status.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(if (healthy) 200 else 503, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.setExecutor(null)
    server.start()
    this
  }

  def stop(): Unit = if (server != null) server.stop(0)
}
