package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Binary metadata extraction — SURVEY.md §2.9 D1, the engine-native
  * replacement for the reference's hachoir dependency (DMS.py:70-91):
  * magic-byte sniffing + real header decoding of JPEG/PNG/GIF/BMP images
  * (dimensions), WAV audio (sample rate / channels / bits / duration via
  * RIFF chunk walk) and PDF, pure JVM, offline.
  *
  * Returns the same shape the reference produced — an open-ended
  * `Map[String, String]` of metadata keys (mime, width, height, byte
  * length) that lands in the documents table's `meta` column (§1.2).
  */
object Metadata {

  /** Big-endian unsigned 16-bit read. */
  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Big-endian unsigned 32-bit read. */
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Little-endian unsigned 16-bit read (GIF/BMP/WAV fields). */
  private[graft] def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Little-endian unsigned 32-bit read (BMP/WAV fields). */
  private[graft] def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Sniff mime + dimensions from the leading bytes of a binary blob. */
  /** First-IFD walk of a TIFF structure rooted at `base` (offsets inside
    * the IFD are relative to `base` — that's what makes the same walk
    * serve both standalone TIFF files and the EXIF blob inside a JPEG
    * APP1 segment). Entries are 12 bytes (tag, type, count, value);
    * ImageWidth = 256, ImageLength = 257, Orientation = 274; values
    * inline for SHORT/LONG count 1, with SHORT values in the FIRST two
    * bytes of the value field in either endianness. */
  private def tiffTags(bytes: Array[Byte], base: Int): Map[String, String] = {
    if (base + 8 > bytes.length) return Map.empty
    val le = bytes(base) == 'I' && bytes(base + 1) == 'I'
    val be = bytes(base) == 'M' && bytes(base + 1) == 'M'
    if (!le && !be) return Map.empty
    def r16(i: Int): Int =
      if (le) u16le(bytes, i) else ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    def r32(i: Int): Long =
      if (le) u32le(bytes, i)
      else ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    var m = Map.empty[String, String]
    val ifd = base + r32(base + 4)
    if (ifd >= base + 8 && ifd + 2 <= bytes.length) {
      val n = r16(ifd.toInt)
      var e = 0
      while (e < n && ifd + 2 + (e + 1) * 12 <= bytes.length) {
        val p = (ifd + 2 + e * 12).toInt
        val tag = r16(p); val typ = r16(p + 2)
        val v = if (typ == 3) r16(p + 8).toLong else r32(p + 8)
        if (tag == 256) m += ("width" -> v.toString)
        if (tag == 257) m += ("height" -> v.toString)
        if (tag == 274) m += ("orientation" -> v.toString)
        e += 1
      }
    }
    m
  }

  def sniff(bytes: Array[Byte]): Map[String, String] = {
    if (bytes == null) return Map.empty
    val base = Map("length" -> bytes.length.toString)
    val meta: Map[String, String] =
      if (bytes.length >= 24 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
        // PNG: IHDR is always the first chunk; width/height at offsets 16/20
        Map("mime" -> "image/png",
          "width" -> u32(bytes, 16).toString,
          "height" -> u32(bytes, 20).toString)
      } else if (bytes.length >= 4 &&
        (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
        // JPEG: walk segment markers to the first SOFn frame header,
        // collecting EXIF orientation from any APP1 "Exif\0\0" segment
        // passed on the way (EXIF = a little TIFF embedded at the APP1
        // payload — the same IFD walk as the standalone TIFF branch)
        var i = 2
        var dims: Option[(Int, Int)] = None
        var exif = Map.empty[String, String]
        while (dims.isEmpty && i + 9 < bytes.length && (bytes(i) & 0xff) == 0xff) {
          val marker = bytes(i + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 &&
            marker != 0xc8 && marker != 0xcc) {
            dims = Some((u16(bytes, i + 7), u16(bytes, i + 5))) // (width, height)
          } else {
            if (marker == 0xe1 && i + 10 < bytes.length &&
              bytes(i + 4) == 'E' && bytes(i + 5) == 'x' && bytes(i + 6) == 'i' &&
              bytes(i + 7) == 'f' && bytes(i + 8) == 0 && bytes(i + 9) == 0) {
              // first-wins across multiple APP1 segments: a later Exif
              // block lacking tag 274 must not discard an orientation
              // already found, so only overwrite on an actual yield
              exif = tiffTags(bytes, i + 10).get("orientation")
                .map(o => Map("orientation" -> o)).getOrElse(exif)
            }
            val len = u16(bytes, i + 2)
            i += 2 + len
          }
        }
        Map("mime" -> "image/jpeg") ++ exif ++ dims.map { case (w, h) =>
          Map("width" -> w.toString, "height" -> h.toString)
        }.getOrElse(Map.empty)
      } else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') {
        Map("mime" -> "image/gif",
          "width" -> u16le(bytes, 6).toString,
          "height" -> u16le(bytes, 8).toString)
      } else if (bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' &&
        bytes(2) == 'D' && bytes(3) == 'F') {
        Map("mime" -> "application/pdf")
      } else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M') {
        // BMP: BITMAPINFOHEADER width/height at offsets 18/22 (LE,
        // height may be negative = top-down; report magnitude)
        Map("mime" -> "image/bmp",
          "width" -> u32le(bytes, 18).toInt.toString,
          "height" -> math.abs(u32le(bytes, 22).toInt).toString)
      } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
        // WAV: walk RIFF chunks for fmt (channels/rate/bits) and data
        // (byte count -> duration). Chunk sizes are LE32, chunks are
        // word-aligned.
        var i = 12
        var m = Map("mime" -> "audio/wav")
        var rate = 0L; var channels = 0; var bits = 0; var dataLen = -1L
        while (i + 8 <= bytes.length) {
          val id = new String(bytes.slice(i, i + 4), "US-ASCII")
          val sz = u32le(bytes, i + 4)
          if (id == "fmt " && i + 24 <= bytes.length) {
            channels = u16le(bytes, i + 10)
            rate = u32le(bytes, i + 12)
            bits = u16le(bytes, i + 22)
            m ++= Map("channels" -> channels.toString,
              "sample_rate" -> rate.toString, "bits" -> bits.toString)
          } else if (id == "data") {
            dataLen = sz
          }
          // advance in Long space: a corrupt size >= 2^31 truncated via
          // toInt would step 0 or negative (infinite loop / AIOOBE)
          val next = i.toLong + 8L + sz + (sz & 1L)
          i = if (next > bytes.length.toLong) bytes.length else next.toInt
        }
        if (dataLen >= 0 && rate > 0 && channels > 0 && bits > 0) {
          val durationMs = dataLen * 8000L / (rate * channels * bits)
          m += ("duration_ms" -> durationMs.toString)
        }
        m
      } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ') {
        // AVI: walk RIFF chunks for the avih main header (dims + frame
        // count); the LIST('hdrl') wrapper means avih sits at a nested
        // offset, so walk one LIST level like the WAV branch
        var m = Map("mime" -> "video/avi")
        var i = 12
        while (i + 8 <= bytes.length) {
          val id = new String(bytes.slice(i, i + 4), "US-ASCII")
          val sz = u32le(bytes, i + 4)
          if (id == "LIST") { i += 12 } // descend into the list body
          else {
            if (id == "avih" && i + 8 + 40 <= bytes.length) {
              m += ("width" -> u32le(bytes, i + 40).toString,
                "height" -> u32le(bytes, i + 44).toString,
                "n_frames" -> u32le(bytes, i + 24).toString)
            }
            val next = i.toLong + 8L + sz + (sz & 1L)
            i = if (next > bytes.length.toLong) bytes.length else next.toInt
          }
        }
        m
      } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P') {
        // WebP: third RIFF family member. Three sub-formats carry dims
        // differently: VP8X (extended) = 24-bit LE canvas-minus-one at
        // payload offsets 4/7; VP8L (lossless) = 14+14 bits packed after
        // the 0x2f signature byte; VP8 (lossy) = 14-bit LE u16 pair after
        // the 0x9d012a start code.
        var m = Map("mime" -> "image/webp")
        if (bytes.length >= 20) {
          val id = new String(bytes.slice(12, 16), "US-ASCII")
          m += ("format" -> id.trim)
          if (id == "VP8X" && bytes.length >= 30) {
            val w = (u16le(bytes, 24) | ((bytes(26) & 0xff) << 16)) + 1
            val h = ((bytes(27) & 0xff) | ((bytes(28) & 0xff) << 8) |
              ((bytes(29) & 0xff) << 16)) + 1
            m += ("width" -> w.toString, "height" -> h.toString)
          } else if (id == "VP8L" && bytes.length >= 25 &&
            (bytes(20) & 0xff) == 0x2f) {
            val v = u32le(bytes, 21)
            m += ("width" -> (((v & 0x3fff) + 1).toString),
              "height" -> ((((v >> 14) & 0x3fff) + 1).toString))
          } else if (id == "VP8 " && bytes.length >= 30 &&
            (bytes(23) & 0xff) == 0x9d && (bytes(24) & 0xff) == 0x01 &&
            (bytes(25) & 0xff) == 0x2a) {
            m += ("width" -> (u16le(bytes, 26) & 0x3fff).toString,
              "height" -> (u16le(bytes, 28) & 0x3fff).toString)
          }
        }
        m
      } else if (bytes.length >= 8 &&
        ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 0x2a && bytes(3) == 0) ||
          (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 0x2a))) {
        // TIFF: endian-tagged IFD walk ([[tiffTags]], shared with the
        // EXIF payload inside JPEG APP1)
        Map("mime" -> "image/tiff") ++ tiffTags(bytes, 0)
      } else if (bytes.length >= 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
        bytes(2) == 'a' && bytes(3) == 'C' && (bytes(4) & 0x7f) == 0) {
        // FLAC: "fLaC" magic, then the mandatory STREAMINFO metadata
        // block (type 0, 34 bytes). Big-endian bit-packed fields at the
        // 8-byte payload offset: sample rate 20 bits, channels-1 3 bits,
        // bits-per-sample-1 5 bits, total samples 36 bits.
        val p = 8
        val rate = ((bytes(p + 10) & 0xff) << 12) | ((bytes(p + 11) & 0xff) << 4) |
          ((bytes(p + 12) & 0xff) >> 4)
        val channels = ((bytes(p + 12) >> 1) & 0x07) + 1
        val bits = (((bytes(p + 12) & 0x01) << 4) | ((bytes(p + 13) & 0xff) >> 4)) + 1
        val totalSamples = ((bytes(p + 13) & 0x0fL) << 32) |
          ((bytes(p + 14) & 0xffL) << 24) | ((bytes(p + 15) & 0xffL) << 16) |
          ((bytes(p + 16) & 0xffL) << 8) | (bytes(p + 17) & 0xffL)
        val m = Map("mime" -> "audio/flac",
          "sample_rate" -> rate.toString,
          "channels" -> channels.toString,
          "bits" -> bits.toString,
          "total_samples" -> totalSamples.toString)
        if (rate > 0) m + ("duration_ms" -> (totalSamples * 1000L / rate).toString)
        else m
      } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x1a &&
        (bytes(1) & 0xff) == 0x45 && (bytes(2) & 0xff) == 0xdf &&
        (bytes(3) & 0xff) == 0xa3) {
        // EBML (Matroska/WebM): the 4-byte header-element ID; deep dims
        // need the full varint walk (Multimodal.decodeMkv) — the sniff
        // reports the container family only
        Map("mime" -> "video/x-matroska")
      } else if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p') {
        // MP4/ISO BMFF: big-endian header-INCLUSIVE box sizes (the
        // RIFF-vs-ISO difference). Walk top-level boxes to moov, then one
        // level in: mvhd timescale+duration -> duration_ms, first tkhd ->
        // 16.16-fixed track dims.
        var m = Map("mime" -> "video/mp4",
          "brand" -> new String(bytes, 8, 4, "ISO-8859-1"))
        var i = 0
        var moov = -1L
        var corrupt = false
        while (!corrupt && i + 8 <= bytes.length && moov < 0) {
          val sz = u32(bytes, i)
          if (new String(bytes, i + 4, 4, "ISO-8859-1") == "moov" &&
            sz >= 8 && i + sz <= bytes.length) moov = i
          else if (sz < 8 || i + sz > bytes.length) corrupt = true // stop, don't spin
          else i = (i + sz).toInt
        }
        if (moov >= 0) {
          val end = (moov + u32(bytes, moov.toInt)).toInt
          var p = moov.toInt + 8
          var sawTkhd = false
          while (p + 8 <= end) {
            val sz = u32(bytes, p)
            val id = new String(bytes, p + 4, 4, "ISO-8859-1")
            if (id == "mvhd" && p + 28 <= end) {
              val ts = u32(bytes, p + 20)
              val dur = u32(bytes, p + 24)
              if (ts > 0) m += ("duration_ms" -> (dur * 1000L / ts).toString)
            } else if (id == "trak" && p + 8 + 96 <= end && !sawTkhd &&
              new String(bytes, p + 12, 4, "ISO-8859-1") == "tkhd") {
              m += ("width" -> (u32(bytes, p + 92) >> 16).toString,
                "height" -> (u32(bytes, p + 96) >> 16).toString)
              sawTkhd = true
            }
            if (sz < 8 || p + sz > end) p = end else p = (p + sz).toInt
          }
        }
        m
      } else if (bytes.forall(b => (b & 0xff) >= 0x09)) {
        // no NUL/control bytes below tab => treat as text (unsigned
        // compare: UTF-8 multibyte chars are negative as JVM bytes)
        Map("mime" -> "text/plain")
      } else {
        Map("mime" -> "application/octet-stream")
      }
    base ++ meta
  }

  /** Column form of [[sniff]] (a Scala UDF: the branchy byte-walk isn't
    * expressible as built-ins; promote to a codegen Expression only if
    * profiling ever shows it hot — D1 runs once per ingest, not per query).
    */
  val sniffUdf: Column => Column = {
    val f = udf((b: Array[Byte]) => sniff(b))
    c => f(c)
  }
}
