package graft.operators

/** Container-level metadata of an ISO base-media file (MP4/MOV family):
  * what a 100 TB video-ingest pipeline reads BEFORE any frame decode —
  * duration, timescale, track count, brand — to partition, filter and
  * route payloads. Sample decode needs a native codec stack and stays
  * the byte-level stand-in; the CONTAINER walk below is pure JVM and
  * real.
  */
final case class Mp4Meta(
    brand: String, timescale: Int, duration: Long, nTracks: Int)

/** ISO/IEC 14496-12 box walker + minimal writer.
  *
  * Box = [size: u32 BE][type: 4cc][payload]; size == 1 switches to a
  * 64-bit extended size after the type, size == 0 means "to end of
  * file". `moov` children are walked one level for `mvhd` (version 0:
  * 32-bit timescale/duration; version 1: 64-bit duration) and `trak`
  * counting. All offsets/sizes validated in Long — truncated or crafted
  * headers degrade to None, never throw (the MediaCodec contract).
  */
object Mp4Boxes {

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** (payloadStart, payloadEnd, nextBoxStart) or None on a bad header. */
  private def boxBounds(b: Array[Byte], start: Long, limit: Long)
      : Option[(String, Long, Long)] = {
    if (start + 8 > limit) return None
    val size0 = be32(b, start.toInt)
    val id = tag(b, start.toInt + 4)
    val (payload, end) =
      if (size0 == 1) {
        if (start + 16 > limit) return None
        (start + 16, start + be64(b, start.toInt + 8))
      } else if (size0 == 0) (start + 8, limit)
      else (start + 8, start + size0)
    if (end < payload || end > limit) None else Some((id, payload, end))
  }

  def parse(payload: Array[Byte]): Option[Mp4Meta] = {
    val b = payload
    val n = b.length.toLong
    var pos = 0L
    var brand: String = null
    var timescale = -1
    var duration = -1L
    var nTracks = 0
    var sawMoov = false
    while (pos < n) {
      boxBounds(b, pos, n) match {
        case None => return None
        case Some((id, p, end)) =>
          id match {
            case "ftyp" =>
              if (p + 4 > end) return None
              brand = tag(b, p.toInt)
            case "moov" =>
              sawMoov = true
              var cp = p
              while (cp < end) {
                boxBounds(b, cp, end) match {
                  case None => return None
                  case Some((cid, cpay, cend)) =>
                    cid match {
                      case "mvhd" =>
                        if (cpay + 4 > cend) return None
                        val version = b(cpay.toInt) & 0xff
                        if (version == 0) {
                          // fullbox(4) + creation(4) + modification(4)
                          if (cpay + 20 > cend) return None
                          timescale = be32(b, cpay.toInt + 12).toInt
                          duration = be32(b, cpay.toInt + 16)
                        } else if (version == 1) {
                          // fullbox(4) + creation(8) + modification(8)
                          if (cpay + 32 > cend) return None
                          timescale = be32(b, cpay.toInt + 20).toInt
                          duration = be64(b, cpay.toInt + 24)
                        } else return None
                      case "trak" => nTracks += 1
                      case _ => // udta, iods, ... skipped by size
                    }
                    cp = cend
                }
              }
            case _ => // mdat, free, ... skipped by size
          }
          pos = end
      }
    }
    if (brand == null || !sawMoov || timescale <= 0 || duration < 0) None
    else Some(Mp4Meta(brand, timescale, duration, nTracks))
  }

  /** Sample locations of the FIRST track: walk moov→trak→mdia→minf→stbl,
    * read `stsz` (per-sample sizes; or the uniform sample_size), `stco`
    * (chunk offsets) and `stsc` (sample-to-chunk routing: entries
    * (first_chunk, samples_per_chunk) — chunk c uses the LAST entry with
    * first_chunk ≤ c, the ISO 14496-12 run-length convention), then lay
    * each chunk's samples out contiguously from its offset. A missing
    * stsc is accepted only for the 1-chunk case (everything in the one
    * chunk). The declared routing must cover EXACTLY the stsz sample
    * count — too few or too many degrade to None rather than mis-slice.
    * All bounds Long-validated; crafted tables degrade to None (the
    * MediaCodec contract). This retires the "frame decode is a
    * stand-in" caveat for MJPEG: offsets from THIS walk feed the
    * pure-JDK JpegCodec per sample (q206).
    */
  def sampleTable(payload: Array[Byte]): Option[Vector[(Long, Int)]] = {
    val b = payload
    val n = b.length.toLong
    // descend one named level: first matching child's payload bounds
    def child(id: String, from: Long, limit: Long): Option[(Long, Long)] = {
      var pos = from
      while (pos < limit) {
        boxBounds(b, pos, limit) match {
          case None => return None
          case Some((cid, p, end)) =>
            if (cid == id) return Some((p, end))
            pos = end
        }
      }
      None
    }
    for {
      (moovP, moovE) <- child("moov", 0L, n)
      (trakP, trakE) <- child("trak", moovP, moovE)
      (mdiaP, mdiaE) <- child("mdia", trakP, trakE)
      (minfP, minfE) <- child("minf", mdiaP, mdiaE)
      (stblP, stblE) <- child("stbl", minfP, minfE)
      (stszP, stszE) <- child("stsz", stblP, stblE)
      (stcoP, stcoE) <- child("stco", stblP, stblE)
      sizes <- {
        if (stszP + 12 > stszE) None
        else {
          val uniform = be32(b, stszP.toInt + 4)
          val count = be32(b, stszP.toInt + 8)
          if (count <= 0 || count > 0xffff) None // bound crafted counts
          else if (uniform != 0) Some(Vector.fill(count.toInt)(uniform))
          else if (stszP + 12 + 4 * count > stszE) None
          else Some(Vector.tabulate(count.toInt)(i =>
            be32(b, (stszP + 12 + 4L * i).toInt)))
        }
      }
      chunkOffs <- {
        if (stcoP + 8 > stcoE) None
        else {
          val entries = be32(b, stcoP.toInt + 4)
          if (entries <= 0 || entries > 0xffff ||
              stcoP + 8 + 4 * entries > stcoE) None
          else Some(Vector.tabulate(entries.toInt)(i =>
            be32(b, (stcoP + 8 + 4L * i).toInt)))
        }
      }
      perChunk <- {
        // samples per chunk, expanded over the stco chunk list
        child("stsc", stblP, stblE) match {
          case None =>
            if (chunkOffs.size == 1) Some(Vector(sizes.size))
            else None // multi-chunk REQUIRES routing
          case Some((p, e)) =>
            if (p + 8 > e) None
            else {
              val cnt = be32(b, p.toInt + 4)
              if (cnt <= 0 || cnt > 0xffff || p + 8 + 12 * cnt > e) None
              else {
                val entries = Vector.tabulate(cnt.toInt) { i =>
                  val off = (p + 8 + 12L * i).toInt
                  (be32(b, off), be32(b, off + 4)) // (first_chunk, per)
                }
                // first_chunk is 1-based and must be strictly increasing
                // starting at 1, or the run-length expansion is undefined
                if (entries.head._1 != 1L ||
                    entries.map(_._1) != entries.map(_._1).sorted ||
                    entries.map(_._1).distinct.size != entries.size ||
                    entries.exists(_._2 <= 0)) None
                else Some(Vector.tabulate(chunkOffs.size) { c =>
                  entries.takeWhile(_._1 <= c + 1).last._2.toInt
                })
              }
            }
        }
      }
      out <- {
        if (sizes.exists(sz => sz <= 0 || sz > Int.MaxValue) ||
            perChunk.map(_.toLong).sum != sizes.size) None
        else {
          var sampleIdx = 0
          val acc = Vector.newBuilder[(Long, Int)]
          var ok = true
          perChunk.zip(chunkOffs).foreach { case (cnt, cOff) =>
            var off = cOff
            (0 until cnt).foreach { _ =>
              val sz = sizes(sampleIdx)
              acc += ((off, sz.toInt))
              off += sz
              sampleIdx += 1
              if (off > n) ok = false
            }
          }
          if (ok) Some(acc.result()) else None
        }
      }
    } yield out
  }

  /** MJPEG-in-MP4 writer: ftyp + mdat (the JPEG samples, contiguous) +
    * moov(mvhd v0, trak(tkhd, mdia(minf(stbl(stsd 'jpeg', stsz
    * per-sample sizes, stsc routing when multi-chunk, stco))))). mdat
    * precedes moov so chunk offsets are known while writing — the
    * layout every streaming muxer avoids and every batch muxer uses.
    * `samplesPerChunk` < frames.length exercises the multi-chunk path:
    * chunks of that many samples (last possibly short), run-length
    * compressed into stsc entries exactly as ISO 14496-12 specifies.
    */
  def buildMjpeg(frames: Seq[Array[Byte]], timescale: Int = 600,
      frameDuration: Int = 20,
      samplesPerChunk: Int = Int.MaxValue): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.nonEmpty), "need frames")
    require(samplesPerChunk > 0, "samplesPerChunk must be positive")
    def w32(b: Array[Byte], off: Int, v: Long): Unit = {
      b(off) = (v >> 24).toByte; b(off + 1) = (v >> 16).toByte
      b(off + 2) = (v >> 8).toByte; b(off + 3) = v.toByte
    }
    def wtag(b: Array[Byte], off: Int, t: String): Unit =
      t.getBytes("US-ASCII").copyToArray(b, off)
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length)
      w32(out, 0, out.length.toLong); wtag(out, 4, id)
      payload.copyToArray(out, 8)
      out
    }
    val ftyp = new Array[Byte](24)
    w32(ftyp, 0, 24); wtag(ftyp, 4, "ftyp"); wtag(ftyp, 8, "isom")
    w32(ftyp, 12, 0x200); wtag(ftyp, 16, "isom"); wtag(ftyp, 20, "mp41")
    val mdat = box("mdat", frames.reduce(_ ++ _))
    val chunkOff = ftyp.length + 8 // first sample starts after mdat header
    val duration = frames.length.toLong * frameDuration
    val mvhd = new Array[Byte](108)
    w32(mvhd, 0, 108); wtag(mvhd, 4, "mvhd")
    w32(mvhd, 20, timescale.toLong); w32(mvhd, 24, duration)
    w32(mvhd, 28, 0x00010000); mvhd(32) = 0x01
    w32(mvhd, 44, 0x00010000); w32(mvhd, 60, 0x00010000)
    w32(mvhd, 76, 0x40000000)
    w32(mvhd, 104, 2)
    val tkhd = new Array[Byte](92)
    w32(tkhd, 0, 92); wtag(tkhd, 4, "tkhd")
    tkhd(11) = 0x07
    w32(tkhd, 20, 1L); w32(tkhd, 28, duration)
    w32(tkhd, 48, 0x00010000); w32(tkhd, 64, 0x00010000)
    w32(tkhd, 80, 0x40000000)
    // stsd with a minimal 'jpeg' VisualSampleEntry (86 bytes)
    val entry = new Array[Byte](86)
    w32(entry, 0, 86); wtag(entry, 4, "jpeg")
    entry(14) = 1 // data_reference_index = 1
    val stsdP = new Array[Byte](8 + entry.length)
    w32(stsdP, 4, 1) // entry_count
    entry.copyToArray(stsdP, 8)
    val stsd = box("stsd", stsdP)
    val stszP = new Array[Byte](12 + 4 * frames.length)
    w32(stszP, 8, frames.length.toLong) // sample_size 0 = per-sample
    frames.zipWithIndex.foreach { case (f, i) =>
      w32(stszP, 12 + 4 * i, f.length.toLong)
    }
    val stsz = box("stsz", stszP)
    // chunking: groups of samplesPerChunk (last possibly short); chunk
    // offsets are cumulative because mdat lays samples out contiguously
    val chunks = frames.grouped(math.min(samplesPerChunk, frames.length))
      .map(_.toSeq).toVector
    val chunkOffsets = chunks.scanLeft(chunkOff.toLong) { (off, ch) =>
      off + ch.map(_.length.toLong).sum
    }.dropRight(1)
    val stcoP = new Array[Byte](8 + 4 * chunks.size)
    w32(stcoP, 4, chunks.size.toLong)
    chunkOffsets.zipWithIndex.foreach { case (o, i) =>
      w32(stcoP, 8 + 4 * i, o)
    }
    val stco = box("stco", stcoP)
    // stsc: run-length entries (first_chunk 1-based, samples_per_chunk,
    // sample_description_index=1) over consecutive equal chunk counts
    val runs = chunks.map(_.size).zipWithIndex
      .foldLeft(Vector.empty[(Int, Int)]) { case (acc, (cnt, idx)) =>
        if (acc.nonEmpty && acc.last._2 == cnt) acc
        else acc :+ ((idx + 1, cnt))
      }
    val stscP = new Array[Byte](8 + 12 * runs.size)
    w32(stscP, 4, runs.size.toLong)
    runs.zipWithIndex.foreach { case ((first, cnt), i) =>
      w32(stscP, 8 + 12 * i, first.toLong)
      w32(stscP, 8 + 12 * i + 4, cnt.toLong)
      w32(stscP, 8 + 12 * i + 8, 1L)
    }
    val stsc = box("stsc", stscP)
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }

  /** Minimal well-formed file: ftyp(isom) + moov(mvhd v0 + nTracks ×
    * trak(tkhd v0)) — the inverse of [[parse]] for the q202 round-trip.
    */
  def build(timescale: Int, duration: Long, nTracks: Int): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && duration <= 0xffffffffL &&
      nTracks >= 0, s"bad mvhd fields: $timescale/$duration/$nTracks")
    def w32(b: Array[Byte], off: Int, v: Long): Unit = {
      b(off) = (v >> 24).toByte; b(off + 1) = (v >> 16).toByte
      b(off + 2) = (v >> 8).toByte; b(off + 3) = v.toByte
    }
    def wtag(b: Array[Byte], off: Int, t: String): Unit =
      t.getBytes("US-ASCII").copyToArray(b, off)
    val ftyp = new Array[Byte](24)
    w32(ftyp, 0, 24); wtag(ftyp, 4, "ftyp"); wtag(ftyp, 8, "isom")
    w32(ftyp, 12, 0x200); wtag(ftyp, 16, "isom"); wtag(ftyp, 20, "mp41")
    val mvhd = new Array[Byte](108)
    w32(mvhd, 0, 108); wtag(mvhd, 4, "mvhd") // v0 + flags = 0
    w32(mvhd, 20, timescale); w32(mvhd, 24, duration)
    w32(mvhd, 28, 0x00010000); mvhd(32) = 0x01 // rate 1.0, volume 1.0
    // unity matrix at offset 8+4+4+4+4+4+4+2+2+8 = 44 (+8 header = 52)
    w32(mvhd, 44, 0x00010000); w32(mvhd, 60, 0x00010000)
    w32(mvhd, 76, 0x40000000)
    w32(mvhd, 104, nTracks + 1) // next_track_id
    val traks = (1 to nTracks).map { tid =>
      val tkhd = new Array[Byte](92)
      w32(tkhd, 0, 92); wtag(tkhd, 4, "tkhd")
      tkhd(11) = 0x07 // v0, flags = enabled|in-movie|in-preview
      w32(tkhd, 20, tid.toLong); w32(tkhd, 28, duration)
      w32(tkhd, 48, 0x00010000); w32(tkhd, 64, 0x00010000)
      w32(tkhd, 80, 0x40000000) // unity matrix
      val trak = new Array[Byte](8 + tkhd.length)
      w32(trak, 0, trak.length.toLong); wtag(trak, 4, "trak")
      tkhd.copyToArray(trak, 8)
      trak
    }
    val moovLen = 8 + mvhd.length + traks.map(_.length).sum
    val moov = new Array[Byte](moovLen)
    w32(moov, 0, moovLen.toLong); wtag(moov, 4, "moov")
    mvhd.copyToArray(moov, 8)
    traks.foldLeft(8 + mvhd.length) { (off, t) =>
      t.copyToArray(moov, off); off + t.length
    }
    ftyp ++ moov
  }
}
