package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import scala.concurrent.duration._

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Metrics emission (reference operator T10 — core/Metrics.scala:25-49):
  * the reference pushes `count`, `latency_millis`, `e2e_latency_millis`
  * and the legacy `latency_collector_to_load` gauge to statsd on a period,
  * and serves a prometheus `scrape`. This is the engine-side equivalent,
  * fed from [[LoaderPipeline.Metrics]]:
  *
  *  - statsd: plain UDP datagrams in the statsd line protocol with
  *    DogStatsD-style `|#k:v` tags — counters as deltas since the last
  *    report, timers as `|ms`, gauges as `|g`
  *  - prometheus: the text exposition format with cumulative counters and
  *    `{k="v"}` labels, served by [[HealthProbe]] at GET /metrics
  *
  * Stream latency (`latency_millis`) comes from the Spark-native signal:
  * each micro-batch's `triggerExecution` duration in
  * StreamingQueryProgress — how long the batch's records waited inside the
  * engine, the closest analogue of the reference's
  * `sourceAndAck.currentStreamLatency` (Metrics.scala:40).
  */
object MetricsEmitter {

  /** monitoring.metrics.statsd config surface (reference
    * config.aws.reference.hocon metrics block).
    */
  final case class StatsdConfig(
      hostname: String,
      port: Int = 8125,
      tags: Map[String, String] = Map.empty,
      period: FiniteDuration = 1.minute,
      prefix: String = "graft.loader")

  private def tagSuffix(tags: Map[String, String]): String =
    if (tags.isEmpty) ""
    else tags.toSeq.sorted.map { case (k, v) => s"$k:$v" }
      .mkString("|#", ",", "")

  /** One report's datagrams. Counters are DELTAS vs the passed snapshots
    * (statsd `|c` semantics); the snapshots are updated in place.
    */
  def statsdDatagrams(
      m: LoaderPipeline.Metrics,
      cfg: StatsdConfig,
      lastCount: AtomicLong,
      lastBad: AtomicLong): Seq[String] = {
    val t = tagSuffix(cfg.tags)
    val p = cfg.prefix
    val count = m.count.get()
    val bad = m.badCount.get()
    val deltaCount = count - lastCount.getAndSet(count)
    val deltaBad = bad - lastBad.getAndSet(bad)
    Seq(s"$p.count:$deltaCount|c$t", s"$p.bad_count:$deltaBad|c$t") ++
      m.latencyMillis.get().map(v => s"$p.latency_millis:$v|ms$t") ++
      m.e2eLatencyMillis.get().toSeq.flatMap { v =>
        Seq(
          s"$p.e2e_latency_millis:$v|ms$t",
          // legacy gauge, seconds (reference Metrics.scala:43)
          s"$p.latency_collector_to_load:${v / 1000}|g$t")
      }
  }

  /** Prometheus text exposition of the same metrics (cumulative values). */
  def prometheusScrape(
      m: LoaderPipeline.Metrics,
      tags: Map[String, String] = Map.empty): String = {
    val labels =
      if (tags.isEmpty) ""
      else tags.toSeq.sorted.map { case (k, v) => s"""$k="$v"""" }
        .mkString("{", ",", "}")
    val sb = new StringBuilder
    def metric(name: String, mtype: String, value: Long): Unit = {
      sb.append(s"# TYPE $name $mtype\n")
      sb.append(s"$name$labels $value\n")
    }
    metric("graft_count", "counter", m.count.get())
    metric("graft_bad_count", "counter", m.badCount.get())
    m.latencyMillis.get().foreach(v => metric("graft_latency_millis", "gauge", v))
    m.e2eLatencyMillis.get().foreach { v =>
      metric("graft_e2e_latency_millis", "gauge", v)
      metric("graft_latency_collector_to_load", "gauge", v / 1000)
    }
    sb.toString
  }

  /** Periodic statsd pusher — a daemon thread sending one UDP datagram per
    * metric every `cfg.period` (reference `report`, Metrics via
    * CommonMetrics.build). `flush()` is public so tests (and shutdown
    * hooks) can force a deterministic report.
    */
  final class StatsdReporter(
      m: LoaderPipeline.Metrics,
      cfg: StatsdConfig) extends AutoCloseable {
    private val socket = new DatagramSocket()
    private val address = InetAddress.getByName(cfg.hostname)
    private val lastCount = new AtomicLong(0)
    private val lastBad = new AtomicLong(0)
    @volatile private var running = true

    def flush(): Unit =
      statsdDatagrams(m, cfg, lastCount, lastBad).foreach { line =>
        val bytes = line.getBytes(StandardCharsets.UTF_8)
        socket.send(new DatagramPacket(bytes, bytes.length, address, cfg.port))
      }

    private val thread = new Thread(() => {
      while (running) {
        try Thread.sleep(cfg.period.toMillis)
        catch { case _: InterruptedException => () }
        if (running) flush()
      }
    }, "graft-statsd-reporter")
    thread.setDaemon(true)

    def start(): StatsdReporter = { thread.start(); this }

    override def close(): Unit = {
      running = false
      thread.interrupt()
      flush() // final report so shutdown never drops counted events
      socket.close()
    }
  }

  /** Wires `latency_millis` from StreamingQueryProgress — register with
    * `spark.streams.addListener`.
    */
  final class StreamLatencyListener(m: LoaderPipeline.Metrics)
      extends StreamingQueryListener {
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val d = e.progress.durationMs
      if (d != null && d.containsKey("triggerExecution")) {
        m.latencyMillis.set(Some(d.get("triggerExecution").longValue()))
      }
    }
  }
}
