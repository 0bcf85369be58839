package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** The pure-JVM BMP codec (r8 verdict #3): real header parsing,
  * bottom-up row flip, 4-byte row padding — plus the registry dispatch
  * in Multimodal.decodeAndExtract (decoded plane for image/bmp, byte
  * stand-in otherwise, graceful fallback on a corrupt payload).
  */
class MediaCodecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def px(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 7 + 3) % 251).toByte)

  test("encode/decode round-trips, width a multiple of 4 (no padding)") {
    val pixels = px(8 * 3 * 3) // 8x3
    val d = BmpCodec.decode(BmpCodec.encode(pixels, 8, 3)).get
    assert(d.width == 8 && d.height == 3 && d.channels == 3)
    assert(d.pixels.sameElements(pixels))
  }

  test("encode/decode round-trips with row padding (width 3 -> stride 12)") {
    val pixels = px(3 * 3 * 5) // 3x5, rowBytes 9, stride 12
    val d = BmpCodec.decode(BmpCodec.encode(pixels, 3, 5)).get
    assert(d.width == 3 && d.height == 5)
    assert(d.pixels.sameElements(pixels))
  }

  test("top-down BMP (negative height) decodes to the same top-down plane") {
    val pixels = px(2 * 3 * 2) // 2x2
    val bottomUp = BmpCodec.encode(pixels, 2, 2)
    // flip the stored rows and negate the height field -> top-down file
    val stride = 8 // 2*3 padded to 4
    val topDown = bottomUp.clone()
    val hNeg = -2
    topDown(22) = hNeg.toByte; topDown(23) = (hNeg >> 8).toByte
    topDown(24) = (hNeg >> 16).toByte; topDown(25) = (hNeg >> 24).toByte
    for (r <- 0 until 2; i <- 0 until stride)
      topDown(54 + r * stride + i) = bottomUp(54 + (1 - r) * stride + i)
    val d = BmpCodec.decode(topDown).get
    assert(d.pixels.sameElements(pixels))
  }

  test("rejects non-BMP, truncated, and unsupported-profile payloads") {
    assert(BmpCodec.decode("not a bitmap at all".getBytes).isEmpty)
    assert(BmpCodec.decode(Array[Byte]('B', 'M', 1, 2)).isEmpty)
    val good = BmpCodec.encode(px(8 * 3), 8, 1)
    assert(BmpCodec.decode(good.take(53)).isEmpty) // truncated header
    val bpp8 = good.clone(); bpp8(28) = 8 // unsupported bit depth
    assert(BmpCodec.decode(bpp8).isEmpty)
    val rle = good.clone(); rle(30) = 1 // compressed profile
    assert(BmpCodec.decode(rle).isEmpty)
    val short = good.take(54 + 10) // pixel array shorter than declared
    assert(BmpCodec.decode(short).isEmpty)
  }

  test("crafted headers degrade to None, never throw (r9 advice: Long-validated sizes)") {
    val good = BmpCodec.encode(px(8 * 3), 8, 1)
    def withLe32(off: Int, v: Int): Array[Byte] = {
      val c = good.clone()
      c(off) = v.toByte; c(off + 1) = (v >> 8).toByte
      c(off + 2) = (v >> 16).toByte; c(off + 3) = (v >> 24).toByte
      c
    }
    // width near 2^30: width*3 overflows Int negative, bounds check must
    // not pass and the pixel alloc must not throw NegativeArraySize
    assert(BmpCodec.decode(withLe32(18, 0x40000000)).isEmpty)
    // 3*width just past Int.MaxValue
    assert(BmpCodec.decode(withLe32(18, 715827883)).isEmpty)
    // Int.MinValue height survives math.abs as negative
    assert(BmpCodec.decode(withLe32(22, Int.MinValue)).isEmpty)
    // offBits pushing the Long extent past the payload
    assert(BmpCodec.decode(withLe32(10, Int.MaxValue)).isEmpty)
  }

  test("decodeAndExtract dispatches by mime: decoded plane for BMP, stand-in else, fallback on corrupt") {
    val pixels = px(8 * 3 * 4) // 8x4 plane
    val bmp = BmpCodec.encode(pixels, 8, 4)
    val viaBmp = Multimodal.decodeAndExtract(MediaRecord(1L, bmp, "image/bmp"))
    // features are computed over the DECODED plane, not the file bytes
    assert(viaBmp.n_bytes == bmp.length) // payload size is still the file
    val expHead = pixels.take(8).map(b => f"${b & 0xff}%02X").mkString
    assert(viaBmp.head_hex == expHead, s"got ${viaBmp.head_hex}")
    // same payload under a stand-in mime reads the file bytes ("BM...")
    val viaStub = Multimodal.decodeAndExtract(MediaRecord(1L, bmp, "application/octet-stream"))
    assert(viaStub.head_hex.startsWith("424D")) // 'B','M'
    // corrupt BMP payload degrades to the stand-in, never throws
    val corrupt = bmp.take(40)
    val viaCorrupt = Multimodal.decodeAndExtract(MediaRecord(1L, corrupt, "image/bmp"))
    assert(viaCorrupt.n_bytes == 40 && viaCorrupt.head_hex.startsWith("424D"))
  }

  test("the typed extractFeatures operator carries the codec through executors") {
    import spark.implicits._
    val pixels = px(8 * 3 * 2)
    val bmp = BmpCodec.encode(pixels, 8, 2)
    val ds = Seq(
      MediaRecord(1L, bmp, "image/bmp"),
      MediaRecord(2L, "plain payload bytes".getBytes, "text/plain")).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    assert(out(0).head_hex == pixels.take(8).map(b => f"${b & 0xff}%02X").mkString)
    assert(out(1).head_hex.startsWith("706C61696E")) // "plain"
  }
}
