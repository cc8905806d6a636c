package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Metadata

/** Multimodal column handling — the mandate's image/audio/video surface.
  *
  * Design: media are opaque `binary` columns + a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as partition-local
  * transforms over `Dataset[MediaRow]` (mapPartitions: one decoder init
  * per partition, vectorized batch through the partition iterator — the
  * same batch shape a Pandas-UDF/Arrow path would have in PySpark).
  *
  * Codec status: BMP pixel arrays, PNG (8-bit RGB: real zlib inflate +
  * all five scanline filters), GIF (variable-width LZW, per-frame decode
  * — animated GIF is the real multi-frame video path), and WAV 16-bit PCM
  * are decoded FOR REAL in pure JVM code ([[decodeBmp]]/[[decodePng]]/
  * [[decodeGif]]/[[decodeWav]] — exact integer pixel/sample statistics,
  * oracle-checked); JPEG routes through the JDK's own codec
  * (javax.imageio, no external library). Only exotic video containers
  * remain behind the declared stub seam (`decodeStub`) — swap
  * [[MediaDecoder.decode]] for a JNI/javacv call and nothing else changes.
  */
object Multimodal {

  /** Typed media row: the storage schema for a multimodal table.
    * Dimension fields are -1 when unknown / not applicable to the kind
    * (images carry width/height, audio carries sample_rate/duration_ms —
    * both decoded from real headers by [[Metadata.sniff]]). */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  /** Decoded feature row: fixed-width embedding per media item. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** The codec seam. Real implementation would JNI into an image/audio
    * library; the stub derives deterministic values from content bytes. */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow, featureDim: Int): MediaFeatures
  }

  /** Deterministic fake decoder: features = normalized xxhash-style PRNG
    * seeded by (media_id, content hash); frame count derived from length.
    * Everything downstream of the codec seam is real.
    */
  object decodeStub extends MediaDecoder {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def decode(row: MediaRow, featureDim: Int): MediaFeatures = {
      val contentHash = java.util.Arrays.hashCode(row.content).toLong
      val seed = mix(row.media_id * 31L + contentHash)
      val feats = Array.tabulate(featureDim) { i =>
        // uniform in [-1, 1), deterministic per (seed, i)
        (mix(seed + i).toDouble / Long.MaxValue.toDouble).toFloat
      }
      val frames = row.kind match {
        case "video" => 1 + (row.content.length % 16)
        case _       => 1
      }
      MediaFeatures(row.media_id, row.kind, row.width, row.height, frames, feats)
    }
  }

  /** Exact integer pixel statistics decoded from a real pixel array (BMP
    * or PNG) — sums are exact Longs so an oracle can reproduce them
    * bit-for-bit. `first_px` is the channel-sum of the VISUAL top-left
    * pixel, which in a bottom-up BMP lives in the LAST stored row
    * (order-sensitive, so it proves row-direction handling; the sums prove
    * padding / filter handling). */
  case class PixelStats(
      width: Int, height: Int, n_px: Long,
      pix_sum: Long, pix_sq_sum: Long, first_px: Long)

  /** Exact integer sample statistics decoded from real 16-bit PCM WAV data. */
  case class WavStats(
      sample_rate: Int, channels: Int, bits: Int,
      n_samples: Long, smp_sum: Long, smp_sq_sum: Long, zero_cross: Long)

  /** Real BMP decode: BITMAPINFOHEADER, uncompressed (BI_RGB) 24-bit only
    * — the one BMP variant that is a pure pixel array. Handles bottom-up
    * (height > 0) and top-down (height < 0) row order and the 4-byte row
    * padding. Returns None for anything it can't decode losslessly. */
  /** Parsed BMP geometry: enough to address any visual pixel in the blob. */
  private case class BmpHeader(
      dataOff: Int, width: Int, height: Int, bottomUp: Boolean, rowSize: Int) {
    /** Byte offset of channel c of VISUAL pixel (x, y) — y = 0 is the top
      * row regardless of storage direction. */
    def at(x: Int, y: Int, c: Int): Int = {
      val stored = if (bottomUp) height - 1 - y else y
      dataOff + stored * rowSize + x * 3 + c
    }
  }

  /** Validate + parse a 24-bit BI_RGB BMP header (the one BMP variant that
    * is a pure pixel array); None for anything not losslessly decodable. */
  private def parseBmp(bytes: Array[Byte]): Option[BmpHeader] = {
    import Metadata.{u16le, u32le}
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return None
    val dataOff = u32le(bytes, 10)
    val width = u32le(bytes, 18).toInt // signed i32
    val rawH = u32le(bytes, 22).toInt
    val bpp = u16le(bytes, 28)
    val comp = u32le(bytes, 30)
    // bound rawH in Long space first: math.abs(Int.MinValue) is still
    // negative, so an unchecked abs would yield a negative height that
    // slips through the byte-range check below as a negative extent
    if (bpp != 24 || comp != 0L || width <= 0 || rawH == 0 ||
      width > (1 << 20) || math.abs(rawH.toLong) > (1L << 20))
      return None
    val height = math.abs(rawH)
    val rowSize = ((width * 3 + 3) / 4) * 4
    if (dataOff < 54L || dataOff + rowSize.toLong * height > bytes.length) return None
    Some(BmpHeader(dataOff.toInt, width, height, rawH > 0, rowSize))
  }

  def decodeBmp(bytes: Array[Byte]): Option[PixelStats] = parseBmp(bytes).map { h =>
    var sum = 0L; var sq = 0L
    var y = 0
    while (y < h.height) {
      val base = h.at(0, y, 0)
      var i = 0
      val rowBytes = h.width * 3 // excludes padding
      while (i < rowBytes) {
        val v = bytes(base + i) & 0xff
        sum += v; sq += v.toLong * v
        i += 1
      }
      y += 1
    }
    val first = (bytes(h.at(0, 0, 0)) & 0xff).toLong +
      (bytes(h.at(0, 0, 1)) & 0xff) + (bytes(h.at(0, 0, 2)) & 0xff)
    PixelStats(h.width, h.height, h.width.toLong * h.height, sum, sq, first)
  }

  private val pngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Paeth predictor (PNG filter type 4): nearest of left/up/upper-left to
    * the linear estimate a + b - c, ties broken left, up, upper-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Real PNG decode, pure JVM: 8-bit-depth truecolor (color type 2),
    * non-interlaced. Walks the chunk stream to IHDR/IDAT/IEND, inflates the
    * concatenated IDAT zlib stream (`java.util.zip.Inflater`), then inverts
    * the per-scanline filter — all five PNG filter types (None/Sub/Up/
    * Average/Paeth) — to reconstruct the actual pixels. Returns the same
    * exact-integer statistics as [[decodeBmp]]; None for any variant it
    * cannot decode losslessly (other bit depths / color types / interlace,
    * truncated or corrupt streams). */
  def decodePng(bytes: Array[Byte]): Option[PixelStats] =
    pngRaw(bytes).map { case (w, h, px) =>
      var sum = 0L; var sq = 0L
      var i = 0
      while (i < px.length) {
        val v = px(i) & 0xff
        sum += v; sq += v.toLong * v
        i += 1
      }
      PixelStats(w, h, w.toLong * h, sum, sq,
        (px(0) & 0xff).toLong + (px(1) & 0xff) + (px(2) & 0xff))
    }

  /** Full PNG decode to the raw TOP-DOWN RGB pixel array (stride w*3):
    * zlib inflate + all five scanline filters. The seam [[decodePng]]
    * (stats) and [[pngToBmp]] (transcode) share. */
  private def pngRaw(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 45) return None
    var i = 0
    while (i < 8) { if (bytes(i) != pngSig(i)) return None; i += 1 }
    // IHDR is required to be the first chunk
    if (u32be(bytes, 8) != 13L ||
      new String(bytes, 12, 4, "US-ASCII") != "IHDR") return None
    val w = u32be(bytes, 16); val h = u32be(bytes, 20)
    val depth = bytes(24) & 0xff; val color = bytes(25) & 0xff
    val interlace = bytes(28) & 0xff
    // bound each dimension BEFORE multiplying: w and h are u32 values up
    // to 2^32-1, so w * h can wrap Long for crafted IHDRs and sneak past
    // a product-only gate into a negative-size allocation
    if (w <= 0 || h <= 0 || w > (1L << 22) || h > (1L << 22) ||
      w * h > (1L << 22) ||
      depth != 8 || color != 2 || interlace != 0) return None
    // chunk walk: concatenate IDAT payloads (decoders must treat multiple
    // IDATs as one zlib stream), stop at IEND, reject sizes that overrun
    val idat = new java.io.ByteArrayOutputStream()
    var p = 8
    var sawEnd = false
    while (!sawEnd && p + 12 <= bytes.length) {
      val len = u32be(bytes, p)
      if (len > bytes.length - p - 12L) return None
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(bytes, p + 8, len.toInt)
      else if (typ == "IEND") sawEnd = true
      p += 12 + len.toInt
    }
    if (idat.size() == 0) return None
    val stride = w.toInt * 3
    val rawLen = (stride + 1) * h.toInt
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, off, rawLen - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off < rawLen) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // invert the scanline filters against the reconstructed previous row
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    val px = new Array[Byte](stride * h.toInt)
    var y = 0
    while (y < h.toInt) {
      val base = y * (stride + 1)
      val ft = raw(base) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val f = raw(base + 1 + x) & 0xff
        val a = if (x >= 3) cur(x - 3) else 0 // left, one pixel = 3 bytes
        val b = prev(x) // up (zero row above the image)
        val rec = ft match {
          case 0 => f
          case 1 => (f + a) & 0xff
          case 2 => (f + b) & 0xff
          case 3 => (f + ((a + b) >> 1)) & 0xff
          case _ => (f + paeth(a, b, if (x >= 3) prev(x - 3) else 0)) & 0xff
        }
        cur(x) = rec
        px(y * stride + x) = rec.toByte
        x += 1
      }
      Array.copy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some((w.toInt, h.toInt, px))
  }

  /** Cross-codec seam: REAL PNG decode re-encoded as the pipeline's
    * canonical 24-bit BMP, so every pixel operator (resize, dHash,
    * near-dup banding) runs on compressed images too. Channel order is
    * passed through untouched — grayscale and per-channel sums are
    * channel-order-invariant, which is all the pixel pipeline assumes. */
  def pngToBmp(bytes: Array[Byte]): Option[Array[Byte]] =
    pngRaw(bytes).map { case (w, h, px) =>
      val rowSize = ((w * 3 + 3) / 4) * 4
      val dataLen = rowSize * h
      val b = java.nio.ByteBuffer.allocate(54 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
      val out = b.array()
      val stride = w * 3
      var y = 0
      while (y < h) {
        // PNG rows are top-down, BMP rows bottom-up
        System.arraycopy(px, y * stride, out, 54 + (h - 1 - y) * rowSize, stride)
        y += 1
      }
      out
    }

  /** dHash across codecs: BMP hashes directly, PNG through the real
    * decode + [[pngToBmp]] transcode — same canonical pixel space, so
    * the same image content yields the SAME hash from either container
    * (pinned by MultimodalSpec). */
  def dHashAny(bytes: Array[Byte]): Option[Long] =
    if (bytes == null || bytes.length < 2) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') dHash(bytes)
    else if (bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == pngSig(i)))
      pngToBmp(bytes).flatMap(dHash)
    else None

  /** Real image resize: nearest-neighbor resample of an actual decoded
    * 24-bit pixel array into a new (bottom-up) BMP — source pixel for
    * target (x, y) is (x*srcW/newW, y*srcH/newH), floor. The output is a
    * valid BMP that [[decodeBmp]] round-trips, so resize composes with the
    * rest of the media pipeline. */
  def resizeBmpNearest(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    parseBmp(bytes).filter(_ => newW > 0 && newH > 0).map { h =>
      val rowSize = ((newW * 3 + 3) / 4) * 4
      val dataLen = rowSize * newH
      val b = java.nio.ByteBuffer.allocate(54 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen).putInt(0).putInt(54)
      b.putInt(40).putInt(newW).putInt(newH).putShort(1).putShort(24)
        .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
      val out = b.array()
      var y = 0
      while (y < newH) {
        val sy = y * h.height / newH
        val outBase = 54 + (newH - 1 - y) * rowSize // bottom-up
        var x = 0
        while (x < newW) {
          val sx = x * h.width / newW
          var c = 0
          while (c < 3) {
            out(outBase + x * 3 + c) = bytes(h.at(sx, sy, c))
            c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }

  /** Real WAV PCM decode: RIFF chunk walk to fmt + data, then the actual
    * 16-bit little-endian samples (all channels, interleaved-flat).
    * Returns None unless format is integer PCM at 16 bits. */
  def decodeWav(bytes: Array[Byte]): Option[WavStats] = {
    import Metadata.{u16le, u32le}
    if (bytes == null || bytes.length < 44 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return None
    var i = 12
    var fmtCode = 0; var channels = 0; var rate = 0L; var bits = 0
    var dataOff = -1L; var dataLen = -1L
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val sz = u32le(bytes, i + 4)
      if (id == "fmt " && i + 24 <= bytes.length) {
        fmtCode = u16le(bytes, i + 8)
        channels = u16le(bytes, i + 10)
        rate = u32le(bytes, i + 12)
        bits = u16le(bytes, i + 22)
      } else if (id == "data" && dataOff < 0) {
        dataOff = i + 8L; dataLen = sz
      }
      val next = i.toLong + 8L + sz + (sz & 1L) // Long space: corrupt sizes can't loop
      i = if (next > bytes.length.toLong) bytes.length else next.toInt
    }
    if (fmtCode != 1 || bits != 16 || channels <= 0 || rate <= 0 || dataOff < 0)
      return None
    val end = math.min(dataOff + dataLen, bytes.length.toLong)
    val n = ((end - dataOff) / 2).toInt
    var sum = 0L; var sq = 0L; var zc = 0L; var prev = 0
    var k = 0
    while (k < n) {
      val o = (dataOff + 2L * k).toInt
      val s = (bytes(o) & 0xff) | (bytes(o + 1).toInt << 8) // sign-extended
      sum += s; sq += s.toLong * s
      if (k > 0 && ((s < 0) != (prev < 0))) zc += 1
      prev = s
      k += 1
    }
    Some(WavStats(rate.toInt, channels, bits, n, sum, sq, zc))
  }

  /** Exact integer pixel statistics of ONE GIF frame — same channel-byte
    * semantics as [[PixelStats]], one row per image descriptor, so an
    * animated GIF yields a REAL frame sequence (the video path's unit). */
  case class GifFrameStats(
      frame_idx: Int, width: Int, height: Int,
      px_sum: Long, px_sq_sum: Long, first_px: Long)

  /** Real GIF decode, pure JVM: GIF87a/89a, global or local 2^n-color
    * palettes, full variable-width LZW with deferred code-size growth and
    * mid-stream CLEAR — each image descriptor (animation frame) is
    * decompressed to its actual palette-mapped pixels (interlaced frames
    * included — the emitted statistics are row-order-invariant, see the
    * inline note). Validated in MultimodalSpec against
    * the JDK's own independent GIF codec (`javax.imageio`) in both
    * directions: this decoder must reproduce ImageIO-written streams
    * (which exercise real code-width growth) bit-exactly, and ImageIO must
    * reproduce [[synthGif]] streams. */
  def decodeGif(bytes: Array[Byte]): Option[Seq[GifFrameStats]] = {
    import Metadata.u16le
    if (bytes == null || bytes.length < 14) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val flags = bytes(10) & 0xff
    var p = 13
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 3 * (1 << ((flags & 7) + 1))
      if (p + n > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, p, p + n); p += n
    }
    val frames = scala.collection.mutable.ArrayBuffer[GifFrameStats]()
    while (true) {
      if (p >= bytes.length) return None // ran off the end before trailer
      val block = bytes(p) & 0xff; p += 1
      block match {
        case 0x3b => return Some(frames.toSeq) // trailer
        case 0x21 => // extension: label byte + terminated sub-blocks
          p += 1
          var len = -1
          while (len != 0) {
            if (p >= bytes.length) return None
            len = bytes(p) & 0xff; p += 1 + len
            if (p > bytes.length) return None
          }
        case 0x2c => // image descriptor = one frame
          if (p + 9 > bytes.length) return None
          val fw = u16le(bytes, p + 4); val fh = u16le(bytes, p + 6)
          val fflags = bytes(p + 8) & 0xff
          p += 9
          // interlace (0x40) is accepted WITHOUT deinterlacing: the stats
          // are row-order-invariant (sums over the pixel multiset), and
          // interlace pass 1 starts at visual row 0, so the first decoded
          // pixel is the visual top-left either way
          var pal = gct
          if ((fflags & 0x80) != 0) {
            val n = 3 * (1 << ((fflags & 7) + 1))
            if (p + n > bytes.length) return None
            pal = java.util.Arrays.copyOfRange(bytes, p, p + n); p += n
          }
          val npx = fw.toLong * fh
          if (pal == null || fw <= 0 || fh <= 0 || npx > (1L << 22)) return None
          if (p >= bytes.length) return None
          val minCode = bytes(p) & 0xff; p += 1
          if (minCode < 2 || minCode > 11) return None
          val data = new java.io.ByteArrayOutputStream()
          var len = -1
          while (len != 0) {
            if (p >= bytes.length) return None
            len = bytes(p) & 0xff; p += 1
            if (len > 0) {
              if (p + len > bytes.length) return None
              data.write(bytes, p, len); p += len
            }
          }
          frames += decodeLzwFrame(data.toByteArray, minCode, pal,
            frames.size, fw, fh).getOrElse(return None)
        case _ => return None // unknown block type: refuse, never guess
      }
    }
    None // unreachable
  }

  /** One frame's LZW stream -> exact pixel statistics via the palette.
    * Variable code width starting at minCode+1, deferred growth (width
    * bumps when the next-to-assign index outgrows it — the GIF89a
    * convention giflib and ImageIO implement), CLEAR resets, and the
    * KwKwK (code == next) case. */
  private def decodeLzwFrame(
      d: Array[Byte], minCode: Int, pal: Array[Byte],
      frameIdx: Int, fw: Int, fh: Int): Option[GifFrameStats] = {
    val palSize = pal.length / 3
    val npx = fw.toLong * fh
    val clear = 1 << minCode; val eoi = clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
    var dictSize = eoi + 1; var codeSize = minCode + 1
    val nBits = d.length.toLong * 8
    var bitPos = 0L
    var prev = -1
    var out = 0L; var sum = 0L; var sq = 0L; var first = 0L
    val stack = new Array[Byte](4096); var sp = 0
    def emit(idx: Int): Boolean = {
      if (idx >= palSize || out >= npx) return false
      val r = pal(3 * idx) & 0xff; val g = pal(3 * idx + 1) & 0xff
      val b = pal(3 * idx + 2) & 0xff
      sum += r + g + b
      sq += r.toLong * r + g.toLong * g + b.toLong * b
      if (out == 0) first = r.toLong + g + b
      out += 1; true
    }
    while (out < npx) {
      // deferred width growth: check against the NEXT assignable index
      // before reading, exactly as the reference decoders do
      if (dictSize >= (1 << codeSize) && codeSize < 12) codeSize += 1
      if (bitPos + codeSize > nBits) return None
      var code = 0; var i = 0
      while (i < codeSize) { // LSB-first bit packing
        val bp = bitPos + i
        if (((d((bp >> 3).toInt) >> (bp & 7).toInt) & 1) != 0) code |= 1 << i
        i += 1
      }
      bitPos += codeSize
      if (code == clear) { dictSize = eoi + 1; codeSize = minCode + 1; prev = -1 }
      else if (code == eoi) return None // EOI before all pixels decoded
      else if (prev == -1) {
        if (code >= clear || !emit(code)) return None
        prev = code
      } else {
        if (code > dictSize || (code == dictSize && dictSize >= 4096)) return None
        var c = code
        if (code == dictSize) { // KwKwK: string(prev) + firstChar(prev)
          c = prev
          var f = prev
          while (f > eoi) f = prefix(f)
          stack(sp) = f.toByte; sp += 1
        }
        while (c > eoi) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= clear) return None // corrupt chain
        val firstChar = c.toByte
        if (!emit(c & 0xff)) return None
        while (sp > 0) {
          sp -= 1
          if (!emit(stack(sp) & 0xff)) return None
        }
        if (dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = firstChar; dictSize += 1
        }
        prev = code
      }
    }
    Some(GifFrameStats(frameIdx, fw, fh, sum, sq, first))
  }

  /** Real GIF LZW encoder (hash-dict longest-match). To stay unambiguous
    * across decoder width conventions it never grows the code width:
    * when the dictionary fills the current width it emits CLEAR and
    * rebuilds — a spec-legal stream every GIF decoder accepts (ImageIO
    * cross-checks this in MultimodalSpec). */
  private def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    val codeSize = minCode + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nacc = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nacc; nacc += codeSize
      while (nacc >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nacc -= 8 }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    put(clear)
    var cur = indices(0)
    var i = 1
    while (i < indices.length) {
      val c = indices(i)
      val key = Integer.valueOf((cur << 12) | c)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        put(cur)
        dict.put(key, Integer.valueOf(next)); next += 1
        if (next >= (1 << codeSize)) { put(clear); dict.clear(); next = eoi + 1 }
        cur = c
      }
      i += 1
    }
    put(cur); put(eoi)
    if (nacc > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Deterministic animated GIF synthesis: 256-entry grayscale global
    * palette (entry i = (i,i,i)), `frames` full-size frames, pixel index
    * at (frame f, position k) = `(seed + 997*f + k) % 256` — closed-form,
    * so a SQL oracle recomputes each frame's exact pixel statistics
    * through the real LZW compression layer. */
  def synthGif(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7); out.write(0); out.write(0) // GCT present, 256 entries
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    var f = 0
    while (f < frames) {
      out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
      out.write(8) // LZW minimum code size
      val idx = Array.tabulate(w * h)(k =>
        (((seed + 997L * f + k) % 256) + 256).toInt % 256)
      val z = lzwEncode(idx, 8)
      var o = 0
      while (o < z.length) { // <=255-byte sub-blocks
        val n = math.min(255, z.length - o)
        out.write(n); out.write(z, o, n); o += n
      }
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** The first `maxN` 16-bit PCM samples of a WAV, for DSP beyond summary
    * statistics (same RIFF walk as [[decodeWav]], same format gates). */
  def wavSamples(bytes: Array[Byte], maxN: Int): Option[Array[Double]] = {
    import Metadata.{u16le, u32le}
    if (bytes == null || bytes.length < 44 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return None
    var i = 12
    var fmtCode = 0; var bits = 0
    var dataOff = -1L; var dataLen = -1L
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val sz = u32le(bytes, i + 4)
      if (id == "fmt " && i + 24 <= bytes.length) {
        fmtCode = u16le(bytes, i + 8); bits = u16le(bytes, i + 22)
      } else if (id == "data" && dataOff < 0) { dataOff = i + 8L; dataLen = sz }
      val next = i.toLong + 8L + sz + (sz & 1L)
      i = if (next > bytes.length.toLong) bytes.length else next.toInt
    }
    if (fmtCode != 1 || bits != 16 || dataOff < 0) return None
    val end = math.min(dataOff + dataLen, bytes.length.toLong)
    val n = math.min(((end - dataOff) / 2).toInt, maxN)
    Some(Array.tabulate(n) { k =>
      val o = (dataOff + 2L * k).toInt
      ((bytes(o) & 0xff) | (bytes(o + 1).toInt << 8)).toDouble
    })
  }

  /** In-place iterative radix-2 Cooley–Tukey FFT (n must be a power of
    * two): bit-reversal permutation + butterfly passes. Pure JVM — the
    * real spectral-analysis primitive behind [[dominantBin]]. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, "fft size must be a power of two")
    // bit-reversal permutation
    var j = 0
    var i = 0
    while (i < n) {
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      var m = n >> 1
      while (m >= 1 && j >= m) { j -= m; m >>= 1 }
      j += m
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k; val b = base + k + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Dominant non-DC frequency bin of a WAV's first `nFft` samples —
    * argmax of FFT magnitude over bins 1..nFft/2, ties to the lower bin.
    * For a square wave of period p (p | nFft) this is nFft/p in closed
    * form, which is what lets a SQL oracle hash-check a real FFT. */
  def dominantBin(bytes: Array[Byte], nFft: Int = 256): Option[Int] =
    wavSamples(bytes, nFft).filter(_.nonEmpty).map { s =>
      val re = new Array[Double](nFft); val im = new Array[Double](nFft)
      Array.copy(s, 0, re, 0, s.length)
      fft(re, im)
      var best = 1; var bestMag = -1.0
      var b = 1
      while (b <= nFft / 2) {
        val m = re(b) * re(b) + im(b) * im(b)
        if (m > bestMag + 1e-9) { bestMag = m; best = b }
        b += 1
      }
      best
    }

  /** Deterministic square-wave WAV: sample i = +A for the first half of
    * each period, -A for the second. Fundamental at bin n/period. */
  def synthWavSquare(period: Int, n: Int = 256, rate: Int = 8000,
      amp: Int = 8000): Array[Byte] = {
    val dataLen = 2 * n
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataLen)
    var i = 0
    while (i < n) {
      b.putShort((if (i % period < period / 2) amp else -amp).toShort)
      i += 1
    }
    b.array()
  }

  val synthWavSquareUdf = udf((period: Int, n: Int) => synthWavSquare(period, n))
  val dominantBinUdf = udf((b: Array[Byte], nFft: Int) => dominantBin(b, nFft))

  /** Deterministic burst-gated mono 16-bit PCM WAV for voice-activity
    * tests: 32-sample blocks; block j is voiced iff (seed + j) % 3 != 0.
    * Voiced sample i: ((seed*7 + 13i) % 8000) + 8000 (abs-sum ≥ 32·8000);
    * silence sample i: (seed + i) % 5 − 2 (abs-sum ≤ 32·2) — so any
    * energy threshold between the bands segments exactly, and the oracle
    * predicts activity closed-form from (seed, j) alone. */
  def synthWavBursts(seed: Long, nBlocks: Int, rate: Int = 8000): Array[Byte] = {
    val n = 32 * nBlocks
    val dataLen = 2 * n
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataLen)
    var i = 0
    while (i < n) {
      val j = i / 32
      val v =
        if ((seed + j) % 3 != 0) (seed * 7 + 13L * i) % 8000 + 8000
        else (seed + i) % 5 - 2
      b.putShort(v.toShort)
      i += 1
    }
    b.array()
  }

  val synthWavBurstsUdf = udf((seed: Long, nb: Int) => synthWavBursts(seed, nb))
  val wavSamplesUdf = udf((b: Array[Byte], n: Int) => wavSamples(b, n))

  /** Real decoder for the formats this JVM can decode without any codec
    * library — BMP pixel arrays, PNG (zlib + scanline filters), GIF
    * (variable-width LZW, real per-frame decode), WAV PCM. Features are
    * normalized summary statistics of the actual pixels/samples; every
    * other format falls back to [[decodeStub]] (the declared seam). */
  object realDecoder extends MediaDecoder {
    def decode(row: MediaRow, featureDim: Int): MediaFeatures = {
      def pack(vals: Array[Double]): MediaFeatures =
        MediaFeatures(row.media_id, row.kind, row.width, row.height, 1,
          Array.tabulate(featureDim)(i => if (i < vals.length) vals(i).toFloat else 0f))
      def imageFeats(s: PixelStats): MediaFeatures = {
        val n = s.n_px * 3.0
        val mean = s.pix_sum / n
        val variance = math.max(s.pix_sq_sum / n - mean * mean, 0.0)
        pack(Array(mean / 255.0, math.sqrt(variance) / 255.0,
          s.first_px / 765.0, s.width.toDouble, s.height.toDouble))
      }
      val real: Option[MediaFeatures] = row.mime match {
        case "image/bmp" => decodeBmp(row.content).map(imageFeats)
        case "image/png" => decodePng(row.content).map(imageFeats)
        case "image/gif" =>
          // animated GIF = the real multi-frame (video) path: n_frames is
          // the actual decoded frame count, stats aggregate every frame
          decodeGif(row.content).filter(_.nonEmpty).map { fs =>
            val n = fs.map(f => f.width.toLong * f.height * 3).sum.toDouble
            val mean = fs.map(_.px_sum).sum / n
            val variance =
              math.max(fs.map(_.px_sq_sum).sum / n - mean * mean, 0.0)
            val vals = Array(mean / 255.0, math.sqrt(variance) / 255.0,
              fs.head.first_px / 765.0, fs.head.width.toDouble,
              fs.head.height.toDouble)
            MediaFeatures(row.media_id, row.kind, fs.head.width,
              fs.head.height, fs.size,
              Array.tabulate(featureDim)(i =>
                if (i < vals.length) vals(i).toFloat else 0f))
          }
        case "image/jpeg" =>
          // JPEG through the JDK's built-in codec (javax.imageio — no
          // external library): real DCT decode to pixel statistics
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(row.content))
            if (img == null || img.getWidth.toLong * img.getHeight > (1L << 22))
              None
            else {
              var sum = 0L; var sq = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
                  val b = rgb & 0xff
                  sum += r + g + b
                  sq += r.toLong * r + g.toLong * g + b.toLong * b
                  x += 1
                }
                y += 1
              }
              val f0 = img.getRGB(0, 0)
              val first = ((f0 >> 16) & 0xff).toLong + ((f0 >> 8) & 0xff) +
                (f0 & 0xff)
              Some(imageFeats(PixelStats(img.getWidth, img.getHeight,
                img.getWidth.toLong * img.getHeight, sum, sq, first)))
            }
          } catch { case _: Exception => None }
        case "audio/wav" =>
          decodeWav(row.content).map { s =>
            val n = math.max(s.n_samples, 1L).toDouble
            val mean = s.smp_sum / n
            val rms = math.sqrt(s.smp_sq_sum / n)
            val zcr = if (s.n_samples > 1) s.zero_cross / (n - 1) else 0.0
            pack(Array(mean / 32768.0, rms / 32768.0, zcr,
              s.sample_rate.toDouble, s.n_samples.toDouble))
          }
        // the three real container walks feed the same pooled multi-frame
        // stats as the animated-GIF path: every video family is a REAL
        // decode in the feature pipeline, not a stub
        case "video/avi" =>
          decodeAvi(row.content).filter(_.nonEmpty).map(fs =>
            videoFeats(row, featureDim,
              fs.map(f => (f.width, f.height, f.pix_sum, f.pix_sq_sum, f.first_px))))
        case "video/mp4" =>
          decodeMp4(row.content).filter(_.nonEmpty).map(fs =>
            videoFeats(row, featureDim,
              fs.map(f => (f.width, f.height, f.pix_sum, f.pix_sq_sum, f.first_px))))
        case "video/x-matroska" =>
          decodeMkv(row.content).filter(_.nonEmpty).map(fs =>
            videoFeats(row, featureDim,
              fs.map(f => (f.width, f.height, f.pix_sum, f.pix_sq_sum, f.first_px))))
        case _ => None
      }
      real.getOrElse(decodeStub.decode(row, featureDim))
    }

    /** Pooled per-frame RGB24 stats -> clip features (the GIF shape). */
    private def videoFeats(row: MediaRow, featureDim: Int,
        fs: Seq[(Int, Int, Long, Long, Long)]): MediaFeatures = {
      val n = fs.map { case (w, h, _, _, _) => w.toLong * h * 3 }.sum.toDouble
      val mean = fs.map(_._3).sum / n
      val variance = math.max(fs.map(_._4).sum / n - mean * mean, 0.0)
      val (w0, h0, _, _, first0) = fs.head
      val vals = Array(mean / 255.0, math.sqrt(variance) / 255.0,
        first0 / 765.0, w0.toDouble, h0.toDouble)
      MediaFeatures(row.media_id, row.kind, w0, h0, fs.size,
        Array.tabulate(featureDim)(i => if (i < vals.length) vals(i).toFloat else 0f))
    }
  }

  /** Deterministic BMP synthesis (24-bit BI_RGB, bottom-up): stored channel
    * byte k (row-major over visual rows, padding excluded) has value
    * `(seed + k) % 256` — closed-form, so a SQL oracle can recompute the
    * exact pixel statistics the decoder must produce. */
  def synthBmp(seed: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataLen = rowSize * h
    val b = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val arr = b.array()
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * rowSize // bottom-up storage
      var x = 0
      val rowBytes = w * 3
      while (x < rowBytes) {
        arr(base + x) = ((seed + y.toLong * rowBytes + x) % 256).toByte
        x += 1
      }
      y += 1
    }
    arr
  }

  /** Deterministic PNG synthesis (8-bit RGB, non-interlaced): reconstructed
    * channel byte k (row-major) has value `(seed + k) % 256` — the same
    * closed form as [[synthBmp]], so a SQL oracle recomputes the exact
    * pixel statistics. Scanline y is encoded with filter type `y % 5`, so
    * decoding a tall-enough image exercises every PNG filter
    * (None/Sub/Up/Average/Paeth); the IDAT stream is real zlib
    * (`java.util.zip.Deflater`), chunks carry real CRC32s. */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] =
    encodePng(w, h, Array.tabulate(h, w * 3)((y, x) =>
      (((seed + y.toLong * w * 3 + x) % 256) + 256).toInt % 256))

  /** Multiplicative-pattern PNG — the SAME pixel content as
    * [[synthBmpMul]] for equal arguments (flat pixel-stream index k ↦
    * (seed·(k+3) + bright) mod 256), so the cross-codec dHash spec can
    * assert BMP and PNG containers hash identically and mm_dhash_png can
    * reuse mm_dhash's closed-form oracle through the zlib layer. */
  def synthPngMul(seed: Long, bright: Int, w: Int, h: Int): Array[Byte] =
    encodePng(w, h, Array.tabulate(h, w * 3) { (y, x) =>
      val k = y.toLong * w * 3 + x
      (((seed * (k + 3) + bright) % 256 + 256) % 256).toInt
    })

  private def encodePng(w: Int, h: Int, rec: Array[Array[Int]]): Array[Byte] = {
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val r = rec(y)(x)
        val a = if (x >= 3) rec(y)(x - 3) else 0
        val b = if (y > 0) rec(y - 1)(x) else 0
        val out = ft match {
          case 0 => r
          case 1 => r - a
          case 2 => r - b
          case 3 => r - ((a + b) >> 1)
          case _ => r - paeth(a, b, if (x >= 3 && y > 0) rec(y - 1)(x - 3) else 0)
        }
        raw(y * (stride + 1) + 1 + x) = (out & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 128)
    val zout = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngSig, 0, 8)
    val crc = new java.util.zip.CRC32()
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array(), 0, 4)
      val t = typ.getBytes("US-ASCII")
      crc.reset(); crc.update(t); crc.update(data)
      out.write(t, 0, 4); out.write(data, 0, data.length)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array())
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Deterministic mono 16-bit PCM WAV synthesis: sample i is
    * `((seed + 13*i) % 65536) - 32768` — closed-form for the oracle. */
  def synthWav(seed: Long, n: Int, rate: Int = 8000): Array[Byte] = {
    val dataLen = 2 * n
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataLen)
    var i = 0
    while (i < n) {
      b.putShort((((seed + 13L * i) % 65536) - 32768).toShort)
      i += 1
    }
    b.array()
  }

  /** Difference hash (dHash) — the standard perceptual image fingerprint
    * for near-dup IMAGE dedup: nearest-neighbor resample to 9×8, integer
    * grayscale ((b+g+r)/3), one bit per adjacent-pixel comparison
    * (gray(x,y) > gray(x+1,y)), 64 bits total. Pure integer math over the
    * REAL decoded pixels, so for closed-form synthetic BMPs the oracle
    * can recompute the exact hash; near-dup pairs then ride the same
    * banded equi-join shape as SimHash (16-bit quarters), never an
    * all-pairs comparison. */
  def dHash(bytes: Array[Byte]): Option[Long] =
    resizeBmpNearest(bytes, 9, 8).flatMap { rb =>
      parseBmp(rb).map { h =>
        def gray(x: Int, y: Int): Int =
          ((rb(h.at(x, y, 0)) & 0xff) + (rb(h.at(x, y, 1)) & 0xff) +
            (rb(h.at(x, y, 2)) & 0xff)) / 3
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (gray(x, y) > gray(x + 1, y)) hash |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        hash
      }
    }

  val dHashUdf = udf((b: Array[Byte]) => dHash(b))
  val dHashAnyUdf = udf((b: Array[Byte]) => dHashAny(b))
  val synthPngMulUdf =
    udf((seed: Long, bright: Int, w: Int, h: Int) => synthPngMul(seed, bright, w, h))

  val synthBmpUdf = udf((seed: Long, w: Int, h: Int) => synthBmp(seed, w, h))

  /** Multiplicative synthetic BMP: channel byte k = (seed*(k+3) + bright)
    * % 256. Unlike [[synthBmp]]'s linear ramp (whose adjacent-pixel
    * differences are nearly constant, collapsing every dHash to the same
    * value), the multiplicative pattern gives each seed a distinctive
    * comparison-sign sequence — so perceptual-hash tests get hashes that
    * actually vary per image — while `bright` models a small global
    * brightness shift (a near-duplicate, flipping only boundary bits). */
  def synthBmpMul(seed: Long, bright: Int, w: Int, h: Int): Array[Byte] = {
    val base = synthBmp(0L, w, h)
    val rowSize = ((w * 3 + 3) / 4) * 4
    var y = 0
    while (y < h) {
      val off = 54 + (h - 1 - y) * rowSize
      var x = 0
      val rowBytes = w * 3
      while (x < rowBytes) {
        val k = y.toLong * rowBytes + x
        base(off + x) = (((seed * (k + 3) + bright) % 256 + 256) % 256).toByte
        x += 1
      }
      y += 1
    }
    base
  }

  val synthBmpMulUdf =
    udf((seed: Long, bright: Int, w: Int, h: Int) => synthBmpMul(seed, bright, w, h))
  val resizeBmpUdf = udf((b: Array[Byte], w: Int, h: Int) => resizeBmpNearest(b, w, h))
  val synthWavUdf = udf((seed: Long, n: Int) => synthWav(seed, n))
  val synthPngUdf = udf((seed: Long, w: Int, h: Int) => synthPng(seed, w, h))
  val synthGifUdf =
    udf((seed: Long, w: Int, h: Int, frames: Int) => synthGif(seed, w, h, frames))
  val gifFramesUdf = udf((b: Array[Byte]) => decodeGif(b))

  // ---- AVI (RIFF) video container: synthesis + real container walk ----

  /** Per-frame pixel statistics from an AVI video stream: '00db' frames
    * are raw bottom-up 24-bit DIBs decoded byte-exactly (same pixel walk
    * as [[decodeBmp]]); '00dc' frames with an MJPG stream format decode
    * through the JDK's independent JPEG codec. */
  case class AviFrameStats(
      frame_idx: Int, width: Int, height: Int, n_px: Long,
      pix_sum: Long, pix_sq_sum: Long, first_px: Long)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  private def putFourcc(bb: java.nio.ByteBuffer, s: String): Unit =
    bb.put(s.getBytes("ISO-8859-1"))

  /** Minimal-but-valid AVI writer: RIFF('AVI ') → LIST('hdrl') with avih
    * and one 'vids' stream (strh + BITMAPINFOHEADER strf, BI_RGB 24-bit)
    * → LIST('movi') of uncompressed bottom-up DIB frames ('00db', rows
    * padded to 4 bytes). Visual channel byte k of frame f has value
    * `(seed + f·w·3·h + k) % 256` — the synthBmp closed form extended
    * with a per-frame offset, so a SQL oracle recomputes every frame's
    * exact pixel statistics THROUGH the container walk. */
  def synthAvi(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val frameLen = rowSize * h
    val strlSize = 4 + 8 + 56 + 8 + 40 // 'strl' + strh + strf
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize // 'hdrl' + avih + LIST(strl)
    val moviSize = 4 + frames * (8 + frameLen + (frameLen & 1))
    val total = 4 + 8 + hdrlSize + 8 + moviSize // 'AVI ' + LIST(hdrl) + LIST(movi)
    val bb = java.nio.ByteBuffer.allocate(8 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    putFourcc(bb, "RIFF"); bb.putInt(total); putFourcc(bb, "AVI ")
    putFourcc(bb, "LIST"); bb.putInt(hdrlSize); putFourcc(bb, "hdrl")
    putFourcc(bb, "avih"); bb.putInt(56)
    bb.putInt(40000).putInt(0).putInt(0).putInt(0) // usec/frame, maxbps, pad, flags
      .putInt(frames).putInt(0).putInt(1).putInt(0) // totalFrames, initial, streams, bufsize
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    putFourcc(bb, "LIST"); bb.putInt(strlSize); putFourcc(bb, "strl")
    putFourcc(bb, "strh"); bb.putInt(56)
    putFourcc(bb, "vids"); putFourcc(bb, "DIB ")
    bb.putInt(0).putInt(0).putInt(0) // flags, prio/lang, initialFrames
      .putInt(1).putInt(25).putInt(0).putInt(frames) // scale, rate, start, length
      .putInt(0).putInt(0).putInt(0) // bufsize, quality, sampleSize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    putFourcc(bb, "strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    putFourcc(bb, "LIST"); bb.putInt(moviSize); putFourcc(bb, "movi")
    val arr = bb.array()
    var f = 0
    var pos = bb.position()
    while (f < frames) {
      putFourcc(bb, "00db"); bb.putInt(frameLen)
      pos = bb.position()
      val fOff = seed + f.toLong * w * 3 * h
      var y = 0
      while (y < h) {
        val base = pos + (h - 1 - y) * rowSize // bottom-up storage
        var x = 0
        val rowBytes = w * 3
        while (x < rowBytes) {
          arr(base + x) = (((fOff + y.toLong * rowBytes + x) % 256 + 256) % 256).toByte
          x += 1
        }
        y += 1
      }
      bb.position(pos + frameLen + (frameLen & 1)) // even-byte chunk padding
      f += 1
    }
    arr
  }

  /** MJPEG AVI writer for the cross-codec spec: same container skeleton,
    * but the stream format fourcc is 'MJPG' and each '00dc' chunk is a
    * complete JPEG produced by the JDK's own encoder. */
  def synthAviMjpeg(jpegFrames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val strlSize = 4 + 8 + 56 + 8 + 40
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    val moviSize = 4 + jpegFrames.map(j => 8 + j.length + (j.length & 1)).sum
    val total = 4 + 8 + hdrlSize + 8 + moviSize
    val bb = java.nio.ByteBuffer.allocate(8 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    putFourcc(bb, "RIFF"); bb.putInt(total); putFourcc(bb, "AVI ")
    putFourcc(bb, "LIST"); bb.putInt(hdrlSize); putFourcc(bb, "hdrl")
    putFourcc(bb, "avih"); bb.putInt(56)
    bb.putInt(40000).putInt(0).putInt(0).putInt(0)
      .putInt(jpegFrames.size).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    putFourcc(bb, "LIST"); bb.putInt(strlSize); putFourcc(bb, "strl")
    putFourcc(bb, "strh"); bb.putInt(56)
    putFourcc(bb, "vids"); putFourcc(bb, "MJPG")
    bb.putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(25).putInt(0).putInt(jpegFrames.size)
      .putInt(0).putInt(0).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    putFourcc(bb, "strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    putFourcc(bb, "MJPG") // biCompression = stream codec fourcc
    bb.putInt(0).putInt(2835).putInt(2835).putInt(0).putInt(0)
    putFourcc(bb, "LIST"); bb.putInt(moviSize); putFourcc(bb, "movi")
    jpegFrames.foreach { j =>
      putFourcc(bb, "00dc"); bb.putInt(j.length); bb.put(j)
      if ((j.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }

  /** Real AVI container walk: validates the RIFF/'AVI ' envelope, finds
    * the video stream's BITMAPINFOHEADER (strf) and decodes every movi
    * frame — '00db' raw DIBs byte-exactly, '00dc' MJPG frames through
    * `javax.imageio` (the JDK's independent JPEG codec). Tolerant of
    * unknown chunks (skipped by size, the RIFF contract) and returns
    * None for anything structurally unsound: truncated chunks, absurd
    * dimensions, frames shorter than the pixel array, or an
    * unsupported codec. */
  def decodeAvi(bytes: Array[Byte]): Option[Seq[AviFrameStats]] = {
    import Metadata.{u16le, u32le}
    if (bytes == null || bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
      fourcc(bytes, 8) != "AVI ") return None
    var w = 0; var hgt = 0; var bottomUp = true; var rowSize = 0
    var comp = ""; var compNum = -1L; var haveStrf = false; var truncated = false
    val frameChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to && !truncated) {
        val id = fourcc(bytes, p)
        val sz = u32le(bytes, p + 4)
        if (sz < 0 || sz > Int.MaxValue - 8 || p + 8 + sz > to) { truncated = true; return }
        val szI = sz.toInt
        if (id == "LIST" && szI >= 4) walk(p + 12, p + 8 + szI)
        else if (id == "strf" && szI >= 40 && !haveStrf) {
          val bw = u32le(bytes, p + 12).toInt
          val rawH = u32le(bytes, p + 16).toInt
          val bpp = u16le(bytes, p + 22)
          comp = fourcc(bytes, p + 24); compNum = u32le(bytes, p + 24)
          if (bw > 0 && bw <= (1 << 12) && rawH != 0 &&
            math.abs(rawH.toLong) <= (1L << 12) && bpp == 24) {
            w = bw; hgt = math.abs(rawH); bottomUp = rawH > 0
            rowSize = ((bw * 3 + 3) / 4) * 4
            haveStrf = true
          }
        } else if ((id == "00db" || id == "00dc") && szI > 0)
          frameChunks += ((p + 8, szI))
        p += 8 + szI + (szI & 1)
      }
    }
    walk(12, bytes.length)
    if (truncated || !haveStrf || frameChunks.isEmpty) return None
    val isRaw = compNum == 0L // BI_RGB
    val isMjpg = comp == "MJPG"
    if (!isRaw && !isMjpg) return None
    val out = Vector.newBuilder[AviFrameStats]
    var idx = 0
    for ((off, len) <- frameChunks) {
      if (isRaw) {
        if (len < rowSize * hgt) return None
        var sum = 0L; var sq = 0L
        var y = 0
        while (y < hgt) {
          val base = off + (if (bottomUp) hgt - 1 - y else y) * rowSize
          var i = 0
          val rowBytes = w * 3
          while (i < rowBytes) {
            val v = bytes(base + i) & 0xff
            sum += v; sq += v.toLong * v
            i += 1
          }
          y += 1
        }
        val fb = off + (if (bottomUp) (hgt - 1) * rowSize else 0)
        val first = (bytes(fb) & 0xff).toLong + (bytes(fb + 1) & 0xff) +
          (bytes(fb + 2) & 0xff)
        out += AviFrameStats(idx, w, hgt, w.toLong * hgt, sum, sq, first)
      } else {
        val img = try {
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes.slice(off, off + len)))
        } catch { case _: Exception => null }
        if (img == null) return None
        var sum = 0L; var sq = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            var c = 0
            while (c < 3) {
              val v = (rgb >> (8 * c)) & 0xff
              sum += v; sq += v.toLong * v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val tl = img.getRGB(0, 0)
        val first = ((tl & 0xff) + ((tl >> 8) & 0xff) + ((tl >> 16) & 0xff)).toLong
        out += AviFrameStats(idx, img.getWidth, img.getHeight,
          img.getWidth.toLong * img.getHeight, sum, sq, first)
      }
      idx += 1
    }
    Some(out.result())
  }

  val synthAviUdf =
    udf((seed: Long, w: Int, h: Int, frames: Int) => synthAvi(seed, w, h, frames))
  val aviFramesUdf = udf((b: Array[Byte]) => decodeAvi(b))
  val bmpStatsUdf = udf((b: Array[Byte]) => decodeBmp(b))
  val pngStatsUdf = udf((b: Array[Byte]) => decodePng(b))
  val wavStatsUdf = udf((b: Array[Byte]) => decodeWav(b))

  // ---- MP4 (ISO BMFF) video container: synthesis + real box walk ----

  /** Per-sample statistics from an MP4 video track: raw RGB24 samples
    * located through the stsc/stsz/stco sample tables, plus the sample's
    * stts duration in media-timescale ticks. */
  case class Mp4FrameStats(
      frame_idx: Int, width: Int, height: Int, n_px: Long,
      pix_sum: Long, pix_sq_sum: Long, first_px: Long, dur_ticks: Int)

  /** A big-endian ISO box: [u32 size][fourcc type][payload...]. Unlike
    * RIFF, sizes INCLUDE the 8-byte header and there is no word padding. */
  private def isoBox(tpe: String, payloads: Array[Byte]*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payloads.map(_.length).sum)
    bb.putInt(bb.capacity()); putFourcc(bb, tpe)
    payloads.foreach(bb.put)
    bb.array()
  }

  private def beInts(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }

  private def beShorts(vs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 * vs.length)
    vs.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  /** Minimal-but-valid MP4 writer: ftyp → moov (mvhd; trak → tkhd, mdia →
    * mdhd/hdlr('vide')/minf → vmhd/dinf/stbl with the full sample-table
    * set: 'raw ' VisualSampleEntry stsd, one-entry stts, a TWO-chunk
    * stsc/stco split — frame 0 alone in chunk 1, the rest in chunk 2 —
    * so the decoder must run the real sample-to-chunk reconstruction) →
    * mdat of top-down unpadded RGB24 frames. Byte k of frame f is
    * `(seed + f·w·h·3 + k) % 256`, so a SQL oracle recomputes every
    * sample's exact pixel statistics THROUGH the box walk; every sample's
    * stts delta is `delta` ticks on a 1000-tick/s media timescale. */
  def synthMp4(seed: Long, w: Int, h: Int, frames: Int, delta: Int): Array[Byte] = {
    val frameLen = w * h * 3
    val nChunks = if (frames > 1) 2 else 1
    def moovFor(mdatStart: Long): Array[Byte] = {
      val entry = isoBox("raw ",
        beShorts(0, 0, 0, 1),                  // 6 reserved bytes + data_ref_index
        beInts(0, 0, 0, 0),                    // pre_defined/reserved (16 bytes)
        beShorts(w, h),
        beInts(0x00480000L, 0x00480000L, 0),   // 72 dpi h/v, reserved
        beShorts(1),                           // frame_count per sample
        new Array[Byte](32),                   // compressorname (empty pstring)
        beShorts(24, 0xffff))                  // depth, pre_defined = -1
      val stsd = isoBox("stsd", beInts(0, 1), entry)
      val stts = isoBox("stts", beInts(0, 1, frames, delta))
      val stsc =
        if (frames > 1) isoBox("stsc", beInts(0, 2, 1, 1, 1, 2, frames - 1L, 1))
        else isoBox("stsc", beInts(0, 1, 1, 1, 1))
      val stsz = isoBox("stsz",
        beInts(0, 0, frames), beInts((0 until frames).map(_ => frameLen.toLong): _*))
      val stco =
        if (frames > 1) isoBox("stco", beInts(0, 2, mdatStart, mdatStart + frameLen))
        else isoBox("stco", beInts(0, 1, mdatStart))
      val stbl = isoBox("stbl", stsd, stts, stsc, stsz, stco)
      val dinf = isoBox("dinf",
        isoBox("dref", beInts(0, 1), isoBox("url ", beInts(1))))
      val vmhd = isoBox("vmhd", beInts(1), beShorts(0, 0, 0, 0))
      val minf = isoBox("minf", vmhd, dinf, stbl)
      val hdlr = isoBox("hdlr", beInts(0, 0), "vide".getBytes("ISO-8859-1"),
        beInts(0, 0, 0), beShorts('v' << 8)) // reserved + name "v\0"
      val dur = frames.toLong * delta
      val mdhd = isoBox("mdhd",
        beInts(0, 0, 0, 1000, dur), beShorts(0x55c4, 0)) // timescale 1000, lang 'und'
      val mdia = isoBox("mdia", mdhd, hdlr, minf)
      val unity = beInts(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000L)
      val tkhd = isoBox("tkhd",
        beInts(7, 0, 0, 1, 0, dur, 0, 0), beShorts(0, 0, 0, 0), unity,
        beInts(w.toLong << 16, h.toLong << 16)) // flags=7, track 1, 16.16 dims
      val mvhd = isoBox("mvhd",
        beInts(0, 0, 0, 1000, dur, 0x00010000L), beShorts(0x0100, 0),
        beInts(0, 0), unity, beInts(0, 0, 0, 0, 0, 0, 2))
      isoBox("moov", mvhd, isoBox("trak", tkhd, mdia))
    }
    val ftyp = isoBox("ftyp", "isom".getBytes("ISO-8859-1"), beInts(0x200),
      "isom".getBytes("ISO-8859-1"))
    // stco holds absolute file offsets, which depend on moov's own size:
    // size a placeholder moov first (box sizes don't change with offset
    // VALUES — beInts is fixed-width), then emit with the real offsets.
    val mdatStart = ftyp.length + moovFor(0L).length + 8L
    val moov = moovFor(mdatStart)
    val mdat = java.nio.ByteBuffer.allocate(8 + frames * frameLen)
    mdat.putInt(mdat.capacity()); putFourcc(mdat, "mdat")
    val arr = mdat.array()
    var f = 0
    while (f < frames) {
      val base = 8 + f * frameLen
      val fOff = seed + f.toLong * frameLen
      var k = 0
      while (k < frameLen) {
        arr(base + k) = (((fOff + k) % 256 + 256) % 256).toByte
        k += 1
      }
      f += 1
    }
    ftyp ++ moov ++ arr
  }

  /** Real ISO BMFF walk: validates the ftyp brand, descends moov → trak →
    * mdia → minf → stbl of the first 'vide'-handler track, reads the
    * VisualSampleEntry dims from stsd, expands stts into per-sample
    * durations, and reconstructs every sample's absolute file offset from
    * stsc (sample-to-chunk runs) + stsz (sizes) + stco (chunk offsets) —
    * the standard sample-lookup algorithm. Raw RGB24 samples are then
    * read straight out of mdat space. Returns None for anything
    * structurally unsound: short/overflowing box sizes, missing tables,
    * absurd dimensions, samples that escape the file, or a non-'raw '
    * codec. Big-endian sizes and header-inclusive box lengths are the
    * ISO-vs-RIFF difference this walk exists to get right. */
  def decodeMp4(bytes: Array[Byte]): Option[Seq[Mp4FrameStats]] = {
    if (bytes == null || bytes.length < 16) return None
    // (type, payloadStart, payloadEnd) for each well-formed child box
    def children(from: Int, to: Int): Option[Seq[(String, Int, Int)]] = {
      val out = Vector.newBuilder[(String, Int, Int)]
      var p = from
      while (p < to) {
        if (p + 8 > to) return None
        val sz = u32be(bytes, p)
        if (sz < 8 || p + sz > to) return None // size 0/1 (to-end, 64-bit) unsupported
        out += ((fourcc(bytes, p + 4), p + 8, p + sz.toInt))
        p += sz.toInt
      }
      Some(out.result())
    }
    val top = children(0, bytes.length).getOrElse(return None)
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    def find(bs: Seq[(String, Int, Int)], tpe: String): Option[(Int, Int)] =
      bs.collectFirst { case (t, s, e) if t == tpe => (s, e) }
    val (moovS, moovE) = find(top, "moov").getOrElse(return None)
    val moovKids = children(moovS, moovE).getOrElse(return None)
    // first trak whose hdlr handler_type is 'vide'
    val videoTrak = moovKids.collectFirst {
      case ("trak", s, e) =>
        for {
          kids <- children(s, e)
          (mdS, mdE) <- find(kids, "mdia")
          mdKids <- children(mdS, mdE)
          (hS, hE) <- find(mdKids, "hdlr")
          if hE - hS >= 12 && fourcc(bytes, hS + 8) == "vide"
        } yield mdKids
    }.flatten.getOrElse(return None)
    val (mdhdS, mdhdE) = find(videoTrak, "mdhd").getOrElse(return None)
    if (mdhdE - mdhdS < 24 || (bytes(mdhdS) & 0xff) != 0) return None // v0 only
    val (minfS, minfE) = find(videoTrak, "minf").getOrElse(return None)
    val stblKids = (for {
      minfKids <- children(minfS, minfE)
      (sS, sE) <- find(minfKids, "stbl")
      k <- children(sS, sE)
    } yield k).getOrElse(return None)
    // stsd: first sample entry must be 'raw ' (byte-exact RGB24) or
    // 'jpeg' (Motion-JPEG-in-BMFF, decoded through the JDK codec) with
    // sane dims
    val (stsdS, stsdE) = find(stblKids, "stsd").getOrElse(return None)
    if (stsdE - stsdS < 8 + 86 || u32be(bytes, stsdS + 4) < 1) return None
    val entryS = stsdS + 8
    val codec = fourcc(bytes, entryS + 4)
    if (u32be(bytes, entryS) < 86 || (codec != "raw " && codec != "jpeg"))
      return None
    val w = ((bytes(entryS + 32) & 0xff) << 8) | (bytes(entryS + 33) & 0xff)
    val h = ((bytes(entryS + 34) & 0xff) << 8) | (bytes(entryS + 35) & 0xff)
    if (w <= 0 || h <= 0 || w > (1 << 12) || h > (1 << 12)) return None
    val frameLen = w * h * 3
    // stts → per-sample durations
    val (sttsS, sttsE) = find(stblKids, "stts").getOrElse(return None)
    val nRuns = u32be(bytes, sttsS + 4).toInt
    if (nRuns < 0 || sttsS + 8 + 8L * nRuns > sttsE) return None
    val durs = Vector.newBuilder[Int]
    var r = 0
    while (r < nRuns) {
      val cnt = u32be(bytes, sttsS + 8 + 8 * r)
      val d = u32be(bytes, sttsS + 12 + 8 * r).toInt
      if (cnt < 0 || cnt > (1 << 20)) return None
      var i = 0L
      while (i < cnt) { durs += d; i += 1 }
      r += 1
    }
    // stsz sizes
    val (stszS, stszE) = find(stblKids, "stsz").getOrElse(return None)
    val fixedSz = u32be(bytes, stszS + 4)
    val nSamples = u32be(bytes, stszS + 8).toInt
    if (nSamples <= 0 || nSamples > (1 << 20)) return None
    val sizes = Array.tabulate(nSamples) { i =>
      if (fixedSz != 0) fixedSz
      else if (stszS + 12 + 4L * i + 4 <= stszE) u32be(bytes, stszS + 12 + 4 * i)
      else return None
    }
    // stsc runs + stco offsets → absolute sample offsets
    val (stscS, stscE) = find(stblKids, "stsc").getOrElse(return None)
    val nStsc = u32be(bytes, stscS + 4).toInt
    if (nStsc <= 0 || stscS + 8 + 12L * nStsc > stscE) return None
    val stsc = Array.tabulate(nStsc)(i => (
      u32be(bytes, stscS + 8 + 12 * i),    // first_chunk (1-based)
      u32be(bytes, stscS + 12 + 12 * i)))  // samples_per_chunk
    val (stcoS, stcoE) = find(stblKids, "stco").getOrElse(return None)
    val nChunks = u32be(bytes, stcoS + 4).toInt
    if (nChunks <= 0 || stcoS + 8 + 4L * nChunks > stcoE) return None
    val chunkOff = Array.tabulate(nChunks)(i => u32be(bytes, stcoS + 8 + 4 * i))
    val offsets = new Array[Long](nSamples)
    var sample = 0
    var chunk = 0
    while (chunk < nChunks && sample < nSamples) {
      // samples_per_chunk of the last stsc run whose first_chunk <= chunk+1
      val spc = stsc.takeWhile(_._1 <= chunk + 1).lastOption.getOrElse(return None)._2
      var inChunk = 0L
      var off = chunkOff(chunk)
      while (inChunk < spc && sample < nSamples) {
        offsets(sample) = off
        off += sizes(sample)
        sample += 1; inChunk += 1
      }
      chunk += 1
    }
    if (sample < nSamples) return None
    val allDurs = durs.result()
    if (allDurs.length < nSamples) return None
    val out = Vector.newBuilder[Mp4FrameStats]
    var s = 0
    while (s < nSamples) {
      val off = offsets(s)
      val len = sizes(s)
      if (off < 0 || len <= 0 || off + len > bytes.length) return None
      if (codec == "raw ") {
        if (len != frameLen) return None
        val base = off.toInt
        var sum = 0L; var sq = 0L
        var k = 0
        while (k < frameLen) {
          val v = bytes(base + k) & 0xff
          sum += v; sq += v.toLong * v
          k += 1
        }
        val first = (bytes(base) & 0xff).toLong + (bytes(base + 1) & 0xff) +
          (bytes(base + 2) & 0xff)
        out += Mp4FrameStats(s, w, h, w.toLong * h, sum, sq, first, allDurs(s))
      } else { // 'jpeg': each sample is a complete JPEG, JDK codec decodes
        val img = try {
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            bytes.slice(off.toInt, off.toInt + len.toInt)))
        } catch { case _: Exception => null }
        if (img == null) return None
        var sum = 0L; var sq = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            var c = 0
            while (c < 3) {
              val v = (rgb >> (8 * c)) & 0xff
              sum += v; sq += v.toLong * v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val tl = img.getRGB(0, 0)
        val first = ((tl & 0xff) + ((tl >> 8) & 0xff) + ((tl >> 16) & 0xff)).toLong
        out += Mp4FrameStats(s, img.getWidth, img.getHeight,
          img.getWidth.toLong * img.getHeight, sum, sq, first, allDurs(s))
      }
      s += 1
    }
    Some(out.result())
  }

  /** Motion-JPEG MP4 writer for the cross-codec spec: the same moov
    * skeleton as [[synthMp4]], but the sample entry is 'jpeg' and every
    * mdat sample is a complete JPEG from the JDK's own encoder (sizes
    * vary per sample, so stsz is non-uniform and the chunk-offset
    * arithmetic is genuinely exercised). */
  def synthMp4Jpeg(jpegFrames: Seq[Array[Byte]], w: Int, h: Int,
      delta: Int): Array[Byte] = {
    val frames = jpegFrames.size
    val nChunks = if (frames > 1) 2 else 1
    def moovFor(mdatStart: Long): Array[Byte] = {
      val entry = isoBox("jpeg",
        beShorts(0, 0, 0, 1), beInts(0, 0, 0, 0), beShorts(w, h),
        beInts(0x00480000L, 0x00480000L, 0), beShorts(1),
        new Array[Byte](32), beShorts(24, 0xffff))
      val stsd = isoBox("stsd", beInts(0, 1), entry)
      val stts = isoBox("stts", beInts(0, 1, frames, delta))
      val stsc =
        if (frames > 1) isoBox("stsc", beInts(0, 2, 1, 1, 1, 2, frames - 1L, 1))
        else isoBox("stsc", beInts(0, 1, 1, 1, 1))
      val stsz = isoBox("stsz",
        beInts(0, 0, frames), beInts(jpegFrames.map(_.length.toLong): _*))
      val stco =
        if (frames > 1)
          isoBox("stco", beInts(0, 2, mdatStart,
            mdatStart + jpegFrames.head.length))
        else isoBox("stco", beInts(0, 1, mdatStart))
      val stbl = isoBox("stbl", stsd, stts, stsc, stsz, stco)
      val dinf = isoBox("dinf",
        isoBox("dref", beInts(0, 1), isoBox("url ", beInts(1))))
      val vmhd = isoBox("vmhd", beInts(1), beShorts(0, 0, 0, 0))
      val minf = isoBox("minf", vmhd, dinf, stbl)
      val hdlr = isoBox("hdlr", beInts(0, 0), "vide".getBytes("ISO-8859-1"),
        beInts(0, 0, 0), beShorts('v' << 8))
      val dur = frames.toLong * delta
      val mdhd = isoBox("mdhd",
        beInts(0, 0, 0, 1000, dur), beShorts(0x55c4, 0))
      val mdia = isoBox("mdia", mdhd, hdlr, minf)
      val unity = beInts(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000L)
      val tkhd = isoBox("tkhd",
        beInts(7, 0, 0, 1, 0, dur, 0, 0), beShorts(0, 0, 0, 0), unity,
        beInts(w.toLong << 16, h.toLong << 16))
      val mvhd = isoBox("mvhd",
        beInts(0, 0, 0, 1000, dur, 0x00010000L), beShorts(0x0100, 0),
        beInts(0, 0), unity, beInts(0, 0, 0, 0, 0, 0, 2))
      isoBox("moov", mvhd, isoBox("trak", tkhd, mdia))
    }
    val ftyp = isoBox("ftyp", "isom".getBytes("ISO-8859-1"), beInts(0x200),
      "isom".getBytes("ISO-8859-1"))
    val mdatStart = ftyp.length + moovFor(0L).length + 8L
    val moov = moovFor(mdatStart)
    val body = jpegFrames.foldLeft(Array.emptyByteArray)(_ ++ _)
    val mdat = java.nio.ByteBuffer.allocate(8 + body.length)
    mdat.putInt(mdat.capacity()); putFourcc(mdat, "mdat"); mdat.put(body)
    ftyp ++ moov ++ mdat.array()
  }

  val synthMp4Udf = udf((seed: Long, w: Int, h: Int, frames: Int, delta: Int) =>
    synthMp4(seed, w, h, frames, delta))
  val mp4FramesUdf = udf((b: Array[Byte]) => decodeMp4(b))

  // ---- MKV (Matroska / EBML) video container: synthesis + real walk ----

  /** Per-frame statistics from a Matroska video track: V_UNCOMPRESSED
    * RGB24 SimpleBlocks located through the EBML element walk, plus the
    * frame's absolute timestamp (cluster Timestamp + block's signed
    * 16-bit relative timestamp, in TimestampScale ticks = ms here). */
  case class MkvFrameStats(
      frame_idx: Int, width: Int, height: Int, n_px: Long,
      pix_sum: Long, pix_sq_sum: Long, first_px: Long, ts_ms: Long)

  /** EBML variable-length integer at `p`: the first byte's leading-zero
    * count picks the width n (1..8); IDs keep the length-marker bit in
    * their value (Matroska convention), sizes strip it. Returns
    * (value, n) or None on a zero lead byte / truncation / (for sizes)
    * the reserved all-ones "unknown size". */
  private def ebmlVar(b: Array[Byte], p: Int, end: Int,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (p >= end) return None
    val first = b(p) & 0xff
    if (first == 0) return None
    val n = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (n > 8 || p + n > end) return None
    var v: Long = if (keepMarker) first else first & ((1 << (8 - n)) - 1)
    var i = 1
    while (i < n) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
    if (!keepMarker && v == (1L << (7 * n)) - 1) return None // unknown size
    Some((v, n))
  }

  /** One EBML element at `p`: (id, payloadStart, payloadEnd) or None. */
  private def ebmlEl(b: Array[Byte], p: Int, end: Int): Option[(Long, Int, Int)] =
    for {
      (id, idLen) <- ebmlVar(b, p, end, keepMarker = true)
      (sz, szLen) <- ebmlVar(b, p + idLen, end, keepMarker = false)
      if sz <= end - (p + idLen + szLen)
    } yield (id, p + idLen + szLen, p + idLen + szLen + sz.toInt)

  private def ebmlIdBytes(id: Long): Array[Byte] = {
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def ebmlSizeBytes(v: Long): Array[Byte] = {
    var n = 1
    while (v >= (1L << (7 * n)) - 1) n += 1 // all-ones per width is reserved
    val full = (1L << (7 * n)) | v
    Array.tabulate(n)(i => ((full >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def ebmlWrap(id: Long, payloads: Array[Byte]*): Array[Byte] = {
    val body = payloads.foldLeft(Array.emptyByteArray)(_ ++ _)
    ebmlIdBytes(id) ++ ebmlSizeBytes(body.length) ++ body
  }

  private def ebmlUint(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  /** Minimal-but-valid Matroska writer: EBML header (DocType matroska) →
    * Segment → Info (TimestampScale 1 ms/tick) + Tracks (one video
    * TrackEntry, CodecID V_UNCOMPRESSED, PixelWidth/Height) + TWO
    * Clusters — frame 0 alone at cluster timestamp 0, frames 1.. in a
    * second cluster at timestamp `delta` carrying signed RELATIVE block
    * timestamps — so the walk must combine cluster + block time and
    * cannot shortcut to one container level. Byte k of frame f is
    * `(seed + f·w·h·3 + k) % 256`, the same closed form the SQL oracle
    * recomputes; frame f's absolute timestamp is f·delta ms. */
  def synthMkv(seed: Long, w: Int, h: Int, frames: Int, delta: Int): Array[Byte] = {
    val frameLen = w * h * 3
    def frameBytes(f: Int): Array[Byte] = {
      val fOff = seed + f.toLong * frameLen
      Array.tabulate(frameLen)(k => (((fOff + k) % 256 + 256) % 256).toByte)
    }
    def simpleBlock(f: Int, relTs: Int): Array[Byte] =
      ebmlWrap(0xA3, // SimpleBlock: track varint 1, s16 rel ts, flags, frame
        Array[Byte](0x81.toByte, (relTs >> 8).toByte, relTs.toByte, 0x00),
        frameBytes(f))
    val header = ebmlWrap(0x1A45DFA3L,
      ebmlWrap(0x4286, ebmlUint(1)), ebmlWrap(0x42F7, ebmlUint(1)),
      ebmlWrap(0x42F2, ebmlUint(4)), ebmlWrap(0x42F3, ebmlUint(8)),
      ebmlWrap(0x4282, "matroska".getBytes("ISO-8859-1")),
      ebmlWrap(0x4287, ebmlUint(2)), ebmlWrap(0x4285, ebmlUint(2)))
    val info = ebmlWrap(0x1549A966L, ebmlWrap(0x2AD7B1, ebmlUint(1000000L)))
    val tracks = ebmlWrap(0x1654AE6BL, ebmlWrap(0xAE,
      ebmlWrap(0xD7, ebmlUint(1)), ebmlWrap(0x73C5, ebmlUint(1)),
      ebmlWrap(0x83, ebmlUint(1)), // TrackType video
      ebmlWrap(0x86, "V_UNCOMPRESSED".getBytes("ISO-8859-1")),
      ebmlWrap(0xE0, ebmlWrap(0xB0, ebmlUint(w)), ebmlWrap(0xBA, ebmlUint(h)))))
    val cluster0 = ebmlWrap(0x1F43B675L,
      ebmlWrap(0xE7, ebmlUint(0)), simpleBlock(0, 0))
    val rest = (1 until frames).map(f =>
      simpleBlock(f, (f - 1) * delta)) // relative to cluster ts = delta
    val cluster1 =
      if (frames > 1)
        ebmlWrap(0x1F43B675L, (ebmlWrap(0xE7, ebmlUint(delta)) +: rest): _*)
      else Array.emptyByteArray
    header ++ ebmlWrap(0x18538067L, info, tracks, cluster0, cluster1)
  }

  /** Real EBML/Matroska walk: validates the EBML header's DocType, then
    * descends Segment → Tracks for the first video TrackEntry
    * (TrackType 1, CodecID V_UNCOMPRESSED, Video→PixelWidth/Height) and
    * Segment → Cluster* for its SimpleBlocks, combining each cluster's
    * Timestamp with the block's signed 16-bit relative timestamp. The
    * variable-length ID/size integers — length encoded in the leading
    * zeros of the first byte — are the EBML-vs-RIFF/ISO difference this
    * walk exists to get right. Returns None for anything structurally
    * unsound: bad varints, unknown sizes, a non-matroska DocType, absurd
    * dims, lacing, or frames that don't match w·h·3. */
  def decodeMkv(bytes: Array[Byte]): Option[Seq[MkvFrameStats]] = {
    if (bytes == null || bytes.length < 8) return None
    def children(from: Int, to: Int): Option[Seq[(Long, Int, Int)]] = {
      val out = Vector.newBuilder[(Long, Int, Int)]
      var p = from
      while (p < to) {
        val (id, s, e) = ebmlEl(bytes, p, to).getOrElse(return None)
        out += ((id, s, e))
        p = e
      }
      Some(out.result())
    }
    def uintAt(s: Int, e: Int): Long = {
      var v = 0L; var i = s
      while (i < e && i - s < 8) { v = (v << 8) | (bytes(i) & 0xff); i += 1 }
      v
    }
    val top = children(0, bytes.length).getOrElse(return None)
    val (_, hS, hE) = top.headOption.filter(_._1 == 0x1A45DFA3L)
      .getOrElse(return None)
    val hKids = children(hS, hE).getOrElse(return None)
    val docType = hKids.collectFirst { case (0x4282L, s, e) =>
      new String(bytes, s, e - s, "ISO-8859-1") }
    if (!docType.contains("matroska")) return None
    val (_, segS, segE) = top.collectFirst { case t @ (0x18538067L, _, _) => t }
      .getOrElse(return None)
    val segKids = children(segS, segE).getOrElse(return None)
    // first video track entry
    val video = segKids.collectFirst { case (0x1654AE6BL, s, e) =>
      children(s, e).flatMap(_.collectFirst { case (0xAEL, ts, te) =>
        children(ts, te).flatMap { entry =>
          val typ = entry.collectFirst { case (0x83L, s2, e2) => uintAt(s2, e2) }
          val num = entry.collectFirst { case (0xD7L, s2, e2) => uintAt(s2, e2) }
          val codec = entry.collectFirst { case (0x86L, s2, e2) =>
            new String(bytes, s2, e2 - s2, "ISO-8859-1") }
          val dims = entry.collectFirst { case (0xE0L, s2, e2) =>
            children(s2, e2).map { v =>
              (v.collectFirst { case (0xB0L, a, b) => uintAt(a, b) },
               v.collectFirst { case (0xBAL, a, b) => uintAt(a, b) })
            }
          }.flatten
          for {
            t <- typ if t == 1L
            n <- num
            c <- codec if c == "V_UNCOMPRESSED"
            (Some(wl), Some(hl)) <- dims
          } yield (n, wl.toInt, hl.toInt)
        }
      }.flatten)
    }.flatten.getOrElse(return None)
    val (trackNum, w, h) = video
    if (w <= 0 || h <= 0 || w > (1 << 12) || h > (1 << 12)) return None
    val frameLen = w * h * 3
    val out = Vector.newBuilder[MkvFrameStats]
    var idx = 0
    for ((cid, cS, cE) <- segKids if cid == 0x1F43B675L) {
      val cKids = children(cS, cE).getOrElse(return None)
      val clusterTs = cKids.collectFirst { case (0xE7L, s, e) => uintAt(s, e) }
        .getOrElse(return None)
      for ((bid, bS, bE) <- cKids if bid == 0xA3) {
        val (tn, tnLen) = ebmlVar(bytes, bS, bE, keepMarker = false)
          .getOrElse(return None)
        if (tn == trackNum) {
          if (bS + tnLen + 3 > bE) return None
          val rel = ((bytes(bS + tnLen) & 0xff) << 8 |
            (bytes(bS + tnLen + 1) & 0xff)).toShort.toInt
          val flags = bytes(bS + tnLen + 2) & 0xff
          if ((flags & 0x06) != 0) return None // lacing unsupported
          val fS = bS + tnLen + 3
          if (bE - fS != frameLen) return None
          var sum = 0L; var sq = 0L
          var k = fS
          while (k < bE) {
            val v = bytes(k) & 0xff
            sum += v; sq += v.toLong * v
            k += 1
          }
          val first = (bytes(fS) & 0xff).toLong + (bytes(fS + 1) & 0xff) +
            (bytes(fS + 2) & 0xff)
          out += MkvFrameStats(idx, w, h, w.toLong * h, sum, sq, first,
            clusterTs + rel)
          idx += 1
        }
      }
    }
    val res = out.result()
    if (res.isEmpty) None else Some(res)
  }

  val synthMkvUdf = udf((seed: Long, w: Int, h: Int, frames: Int, delta: Int) =>
    synthMkv(seed, w, h, frames, delta))
  val mkvFramesUdf = udf((b: Array[Byte]) => decodeMkv(b))

  /** Ingest: raw (id, kind, bytes) -> typed media table with sniffed
    * header metadata. Pure column expressions + the D1 sniff UDF. */
  def ingest(raw: DataFrame): DataFrame = {
    val meta = Metadata.sniffUdf(col("content"))
    raw
      .withColumn("m", meta)
      .select(
        col("media_id"), col("kind"), col("content"),
        coalesce(element_at(col("m"), "mime"),
          lit("application/octet-stream")).as("mime"),
        coalesce(element_at(col("m"), "width").cast("int"), lit(-1)).as("width"),
        coalesce(element_at(col("m"), "height").cast("int"), lit(-1)).as("height"),
        coalesce(element_at(col("m"), "sample_rate").cast("int"), lit(-1))
          .as("sample_rate"),
        coalesce(element_at(col("m"), "duration_ms").cast("long"), lit(-1L))
          .as("duration_ms"))
  }

  /** Feature extraction over a typed media Dataset: partition-local decode
    * (decoder initialized once per partition, not per row). */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = decodeStub,
      featureDim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts are
      // expensive; never construct them per row)
      rows.map(r => decoder.decode(r, featureDim))
    }
  }

  /** Frame sampling plumbing for video: explode n_frames into one row per
    * sampled frame index with a per-frame feature slice (stubbed via a
    * frame-seeded rehash of the clip features). */
  def sampleFrames(features: Dataset[MediaFeatures], everyN: Int = 4): DataFrame = {
    import features.sparkSession.implicits._
    features.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"),
        col("features"))
      .select(col("media_id"), col("frame_idx"),
        // per-frame variation: rotate the clip feature vector by frame_idx
        expr("concat(slice(features, frame_idx % size(features) + 1, " +
          "size(features) - frame_idx % size(features)), " +
          "slice(features, 1, frame_idx % size(features)))").as("frame_features"))
  }

  /** End-to-end pipeline: raw binaries -> typed table -> features. */
  def pipeline(spark: SparkSession, raw: DataFrame, featureDim: Int = 16,
      decoder: MediaDecoder = decodeStub): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(ingest(raw).as[MediaRow], decoder, featureDim)
  }
}
