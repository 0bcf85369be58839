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
  *
  * Objects larger than `maxSinglePutBytes` take a MULTIPART route (the
  * reference uploads one buffer per object — at 100 TB a batch shard can
  * exceed the object store's single-PUT limit, 5 GiB on S3): the buffer
  * is staged as `<path>.mpu/part-NNNNN` chunks, each within the cap,
  * then completed by assembling the parts into the final object and
  * deleting the staging dir (the assembly copy models S3's server-side
  * CompleteMultipartUpload — completion is not itself a client PUT). A
  * task death anywhere in the sequence leaves only staging garbage or a
  * partial target; the retry deletes the staging dir, re-stages every
  * part, and re-completes — same at-least-once ⇒ exactly-once-content
  * contract as the single-PUT path, fault-injected in
  * FaultInjectionSpec.
  */
final class HadoopBlobStore(confSerde: Map[String, String],
    maxSinglePutBytes: Long = HadoopBlobStore.S3SinglePutLimit)
    extends BlobStore {
  def write(path: String, bytes: Array[Byte]): Unit = {
    val conf = new Configuration()
    confSerde.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(new URI(path))
    val fs = FileSystem.get(p.toUri, conf)
    def put(target: Path, slice: Array[Byte], off: Int, len: Int): Unit = {
      var out: OutputStream = null
      try { out = fs.create(target, true); out.write(slice, off, len) }
      finally if (out != null) out.close()
    }
    if (bytes.length <= maxSinglePutBytes) {
      put(p, bytes, 0, bytes.length)
    } else {
      val cap = maxSinglePutBytes.min(Int.MaxValue.toLong).toInt
      val staging = new Path(p.getParent, p.getName + ".mpu")
      // a failed previous attempt may have left partial parts behind
      if (fs.exists(staging)) fs.delete(staging, true)
      // bytes.length > maxSinglePutBytes >= 1 on this branch; compute the
      // ceiling as (n-1)/cap+1 — the (n+cap-1) form overflows Int when
      // length + cap exceeds Int.MaxValue, yielding a negative part count
      // and a silently EMPTY final object.
      val nParts = (bytes.length - 1) / cap + 1
      (0 until nParts).foreach { i =>
        val off = i * cap
        put(new Path(staging, f"part-$i%05d"), bytes, off,
          math.min(cap, bytes.length - off))
      }
      // complete: assemble parts into the final object, then drop staging
      var out: OutputStream = null
      try {
        out = fs.create(p, true)
        (0 until nParts).foreach { i =>
          val in = fs.open(new Path(staging, f"part-$i%05d"))
          try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
          finally in.close()
        }
      } finally if (out != null) out.close()
      fs.delete(staging, true)
    }
  }
}

object HadoopBlobStore {
  /** S3's published single-PUT object limit. */
  val S3SinglePutLimit: Long = 5L * 1024 * 1024 * 1024
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
