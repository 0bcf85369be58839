package graft.sinks

import java.io.{ByteArrayOutputStream, OutputStream}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Blob-store abstraction (reference operator S3 — BlobSink.scala:16-21):
  * one object PUT per (schema, batch) group. Implementations must be
  * serializable: writes happen inside executor tasks.
  */
trait BlobStore extends Serializable {
  def write(path: String, bytes: Array[Byte]): Unit
}

/** Hadoop-FS-backed store — covers file://, hdfs:// and s3a:// URIs with
  * the standard connectors; the production path. One create-write-close
  * per object, no rename ceremony (objects are uniquely named by UUID, so
  * task retries at-least-once overwrite idempotently — same contract as
  * the reference's S3 PUT, S3Sink.scala:29-41).
  */
final class HadoopBlobStore(confSerde: Map[String, String]) extends BlobStore {
  def write(path: String, bytes: Array[Byte]): Unit = {
    val conf = new Configuration()
    confSerde.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(new URI(path))
    val fs = FileSystem.get(p.toUri, conf)
    var out: OutputStream = null
    try { out = fs.create(p, true); out.write(bytes) }
    finally if (out != null) out.close()
  }
}

/** In-memory recording store for tests (the analogue of the reference's
  * MockEnvironment action log). Only valid in local mode (executors share
  * the JVM with the driver): task closures serialize the store, and
  * `readResolve` routes the deserialized copy back to the original
  * instance via the JVM-wide registry, so executor writes land in the
  * map the test is looking at.
  */
final class InMemoryBlobStore extends BlobStore {
  val id: String = java.util.UUID.randomUUID().toString
  InMemoryBlobStore.registry.put(id, this)

  @transient lazy val objects = new ConcurrentHashMap[String, Array[Byte]]()
  def write(path: String, bytes: Array[Byte]): Unit =
    InMemoryBlobStore.registry.get(id).objects.put(path, bytes)
  def paths: Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.toSeq.sorted
  }

  private def readResolve(): Object = {
    val orig = InMemoryBlobStore.registry.get(id)
    if (orig != null) orig else this
  }
}

object InMemoryBlobStore {
  private val registry = new ConcurrentHashMap[String, InMemoryBlobStore]()
}
