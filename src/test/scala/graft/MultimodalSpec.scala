package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Multimodal plumbing — mandate surface. The codec is a deterministic
  * stub; the schema, ingest metadata, partition-local decode, and
  * frame-sampling plumbing are real and under test.
  */
class MultimodalSpec extends AnyFunSuite {
  import SharedSpark._

  private def png(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(24)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    b.array()
  }

  private def wav(rate: Int, channels: Int, bits: Int, dataBytes: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    b.put("data".getBytes).putInt(dataBytes).put(new Array[Byte](dataBytes))
    b.array()
  }

  private def raw = {
    import spark.implicits._
    Seq(
      (1L, "image", png(64, 32)),
      (2L, "image", png(128, 256)),
      (3L, "video", Array.fill[Byte](100)(7)),
      (4L, "audio", wav(rate = 16000, channels = 1, bits = 16, dataBytes = 16000))
    ).toDF("media_id", "kind", "content")
  }

  test("ingest sniffs real header metadata into typed columns") {
    import spark.implicits._
    val m = Multimodal.ingest(raw)
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "content", "mime", "width", "height",
        "sample_rate", "duration_ms"))
    val img = m.filter(col("media_id") === 1L)
      .select("mime", "width", "height").as[(String, Int, Int)].head()
    assert(img == ("image/png", 64, 32))
    // audio carries real header metadata in its typed columns
    // (16000 B of 16-bit mono at 16 kHz = 500 ms)
    val audio = m.filter(col("media_id") === 4L)
      .select("mime", "sample_rate", "duration_ms", "width")
      .as[(String, Int, Long, Int)].head()
    assert(audio == ("audio/wav", 16000, 500L, -1))
    // unknown codecs degrade to a safe default, never fail ingest
    val vid = m.filter(col("media_id") === 3L).select("width").as[Int].head()
    assert(vid == -1)
  }

  test("feature extraction is deterministic and partition-independent") {
    import spark.implicits._
    val media = Multimodal.ingest(raw).as[Multimodal.MediaRow]
    val f1 = Multimodal.extractFeatures(media.repartition(1), featureDim = 8)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f4 = Multimodal.extractFeatures(media.repartition(4), featureDim = 8)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f4)
    assert(f1(1L).size == 8 && f1(1L) != f1(2L))
    assert(f1.values.flatten.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("video frame sampling explodes n_frames with per-frame features") {
    import spark.implicits._
    val feats = Multimodal.pipeline(spark, raw)
    val vid = feats.filter(_.kind == "video").head()
    val frames = Multimodal.sampleFrames(feats, everyN = 2)
    val got = frames.select("media_id", "frame_idx")
      .as[(Long, Int)].collect().toSet
    val wantIdx = (0 until vid.n_frames by 2).map(i => (3L, i)).toSet
    assert(got == wantIdx)
    // per-frame features differ from the clip vector for rotated frames
    val f = frames.filter(col("frame_idx") =!= 0)
      .select("frame_features").as[Seq[Float]].head()
    assert(f.toSet == vid.features.toSet && f != vid.features.toSeq)
  }

  // ---- real codecs (BMP pixel array / WAV PCM) ----

  /** Handcrafted 2x2 24-bit BMP. rowSize = 8 (2 padding bytes per row,
    * set to 0xEE to prove the decoder skips them); rows stored bottom-up
    * unless topDown. Visual pixels (BGR): (1,2,3)(4,5,6) / (7,8,9)(10,11,12). */
  private def bmp2x2(topDown: Boolean): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(54 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(70).putInt(0).putInt(54)
    b.putInt(40).putInt(2).putInt(if (topDown) -2 else 2).putShort(1).putShort(24)
    b.putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val top = Array[Byte](1, 2, 3, 4, 5, 6, 0xee.toByte, 0xee.toByte)
    val bot = Array[Byte](7, 8, 9, 10, 11, 12, 0xee.toByte, 0xee.toByte)
    if (topDown) { b.put(top).put(bot) } else { b.put(bot).put(top) }
    b.array()
  }

  test("decodeBmp: exact pixel sums, padding skipped, row order honored") {
    for (topDown <- Seq(false, true)) {
      val s = Multimodal.decodeBmp(bmp2x2(topDown)).get
      assert(s.width == 2 && s.height == 2 && s.n_px == 4)
      assert(s.pix_sum == (1 to 12).sum) // 0xEE padding NOT counted
      assert(s.pix_sq_sum == (1 to 12).map(v => v * v).sum)
      // visual top-left pixel is the LAST stored row when bottom-up
      assert(s.first_px == 1 + 2 + 3, s"topDown=$topDown")
    }
    // non-decodable variants return None, never garbage
    assert(Multimodal.decodeBmp(Array[Byte]('B', 'M', 1, 2)).isEmpty)
    val bad8bpp = bmp2x2(false).clone(); bad8bpp(28) = 8
    assert(Multimodal.decodeBmp(bad8bpp).isEmpty)
  }

  test("decodeWav: exact sample stats from real little-endian PCM") {
    val b = java.nio.ByteBuffer.allocate(44 + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + 12).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(44100).putInt(88200).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(12)
    Seq(100, -100, 100, -100, 0, 50).foreach(v => b.putShort(v.toShort))
    val s = Multimodal.decodeWav(b.array()).get
    assert(s.sample_rate == 44100 && s.channels == 1 && s.bits == 16)
    assert(s.n_samples == 6 && s.smp_sum == 50)
    assert(s.smp_sq_sum == 4L * 10000 + 2500)
    assert(s.zero_cross == 4)
    // 8-bit or float PCM is not decodable here -> None
    val b8 = b.array().clone(); b8(34) = 8
    assert(Multimodal.decodeWav(b8).isEmpty)
  }

  test("synth/decode roundtrip matches the closed-form oracle arithmetic") {
    for (seed <- Seq(0L, 31L, 12345L); w <- 3 to 5) {
      val s = Multimodal.decodeBmp(Multimodal.synthBmp(seed, w, 3)).get
      val vals = (0 until w * 9).map(k => (seed + k) % 256)
      assert(s.pix_sum == vals.sum && s.pix_sq_sum == vals.map(v => v * v).sum)
      assert(s.first_px == vals.take(3).sum && s.n_px == w * 3)
    }
    val w = Multimodal.decodeWav(Multimodal.synthWav(7L, 100)).get
    val samples = (0 until 100).map(i => (7L + 13 * i) % 65536 - 32768)
    assert(w.n_samples == 100 && w.smp_sum == samples.sum)
    assert(w.smp_sq_sum == samples.map(v => v * v).sum)
  }

  test("decodePng: real zlib inflate + all five scanline filters, exact stats") {
    // h >= 5 forces every filter type (synthPng encodes row y with y % 5);
    // the reconstructed pixels must match the closed form regardless
    for (seed <- Seq(0L, 31L, 12345L); w <- 3 to 5) {
      val s = Multimodal.decodePng(Multimodal.synthPng(seed, w, 6)).get
      val vals = (0 until w * 18).map(k => (seed + k) % 256)
      assert(s.width == w && s.height == 6 && s.n_px == w * 6)
      assert(s.pix_sum == vals.sum && s.pix_sq_sum == vals.map(v => v * v).sum)
      assert(s.first_px == vals.take(3).sum)
    }
    // ingest sniffs the synthesized bytes as a real PNG with real dims
    val meta = graft.functions.Metadata.sniff(Multimodal.synthPng(1L, 5, 6))
    assert(meta("mime") == "image/png" && meta("width") == "5" && meta("height") == "6")
    val valid = Multimodal.synthPng(9L, 4, 6)
    // grayscale (color type 0) is declared non-decodable -> None
    val gray = valid.clone(); gray(25) = 0
    assert(Multimodal.decodePng(gray).isEmpty)
    // 16-bit depth -> None
    val deep = valid.clone(); deep(24) = 16
    assert(Multimodal.decodePng(deep).isEmpty)
    // truncated IDAT (cut mid-stream) -> None, never a partial decode
    assert(Multimodal.decodePng(valid.take(valid.length - 20)).isEmpty)
    // corrupt zlib payload -> None via DataFormatException path
    val corrupt = valid.clone(); corrupt(45) = (corrupt(45) ^ 0x55).toByte
    Multimodal.decodePng(corrupt) // must not throw (result unconstrained)
  }

  /** Per-frame channel-byte sums of a BufferedImage — the same semantics
    * as GifFrameStats/PixelStats, computed through the JDK's independent
    * codec for cross-validation. */
  private def imageSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var sum = 0L; var sq = 0L; var first = -1L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      if (first < 0) first = r.toLong + g + b
      sum += r + g + b
      sq += r.toLong * r + g.toLong * g + b.toLong * b
    }
    (sum, sq, first)
  }

  test("decodeGif: closed-form frames through real LZW; None for corrupt variants") {
    for (seed <- Seq(0L, 13L, 9999L)) {
      val fs = Multimodal.decodeGif(Multimodal.synthGif(seed, 5, 4, 3)).get
      assert(fs.size == 3)
      for (f <- 0 until 3) {
        val idx = (0 until 20).map(k => (seed + 997 * f + k) % 256)
        val s = fs(f)
        assert(s.width == 5 && s.height == 4 && s.frame_idx == f)
        assert(s.px_sum == 3 * idx.sum)
        assert(s.px_sq_sum == 3 * idx.map(v => v * v).sum)
        assert(s.first_px == 3 * idx.head)
      }
    }
    val valid = Multimodal.synthGif(13L, 5, 4, 2)
    // truncation anywhere inside the stream must give None, not garbage
    assert(Multimodal.decodeGif(valid.take(valid.length - 2)).isEmpty)
    assert(Multimodal.decodeGif(valid.take(20)).isEmpty)
    assert(Multimodal.decodeGif("GIF89a".getBytes).isEmpty)
  }

  test("decodeGif/synthGif cross-validate against the JDK's own GIF codec") {
    // direction 1: ImageIO reads our encoder's stream to the same pixels
    // (proves synthGif emits spec-valid GIF, not merely self-consistent)
    val bytes = Multimodal.synthGif(13L, 6, 5, 2)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val rdr = javax.imageio.ImageIO.getImageReaders(iis).next()
    rdr.setInput(iis)
    assert(rdr.getNumImages(true) == 2)
    val mine = Multimodal.decodeGif(bytes).get
    for (f <- 0 until 2) {
      val (sum, sq, first) = imageSums(rdr.read(f))
      assert((sum, sq, first) ==
        (mine(f).px_sum, mine(f).px_sq_sum, mine(f).first_px))
    }
    // direction 2: our decoder reproduces an ImageIO-WRITTEN stream —
    // ImageIO's encoder uses real variable-width LZW (code-width growth
    // past 9/10 bits on this 80x60 image), so this pins the deferred
    // width-growth convention against an independent reference codec
    val grays = (0 until 256).map(_.toByte).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new java.awt.image.BufferedImage(80, 60,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val rnd = new scala.util.Random(7)
    var expSum = 0L; var expSq = 0L; var expFirst = -1L
    for (y <- 0 until 60; x <- 0 until 80) {
      val v = if (rnd.nextBoolean()) rnd.nextInt(256) else (x + y) % 256
      img.getRaster.setSample(x, y, 0, v)
      if (expFirst < 0) expFirst = 3L * v
      expSum += 3L * v; expSq += 3L * v * v
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos))
    val got = Multimodal.decodeGif(baos.toByteArray).get
    assert(got.size == 1 && got.head.width == 80 && got.head.height == 60)
    assert(got.head.px_sum == expSum && got.head.px_sq_sum == expSq &&
      got.head.first_px == expFirst)
  }

  test("realDecoder: jpeg decodes through the JDK codec, gif frames are real") {
    import spark.implicits._
    // a real JPEG produced by the JDK encoder (lossy, so the expectation
    // is computed by decoding it back through ImageIO independently)
    val src = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      src.setRGB(x, y, ((x * 16) << 16) | ((y * 16) << 8) | ((x + y) * 8))
    val jb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", jb))
    val jpegBytes = jb.toByteArray
    val gifBytes = Multimodal.synthGif(5L, 4, 4, 3)
    val rows = Seq(
      (20L, "image", jpegBytes),
      (21L, "video", gifBytes))
      .toDF("media_id", "kind", "content")
    val feats = Multimodal.pipeline(spark, rows, featureDim = 8,
        decoder = Multimodal.realDecoder)
      .collect().map(f => f.media_id -> f).toMap
    val (jsum, _, _) = imageSums(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpegBytes)))
    assert(math.abs(feats(20L).features(0) - jsum / (256 * 3.0) / 255.0) < 1e-6)
    // the gif's frame count is the REAL decoded count, not a stub formula
    assert(feats(21L).n_frames == 3)
    val gs = Multimodal.decodeGif(gifBytes).get
    val gn = gs.map(f => f.width.toLong * f.height * 3).sum.toDouble
    assert(math.abs(feats(21L).features(0) -
      gs.map(_.px_sum).sum / gn / 255.0) < 1e-6)
  }

  test("decodeAvi: closed-form DIB frames through the real RIFF walk") {
    val (seed, w, h, nf) = (37L, 5, 3, 3) // w=5 -> row padding exercised
    val avi = Multimodal.synthAvi(seed, w, h, nf)
    val frames = Multimodal.decodeAvi(avi).get
    assert(frames.size == nf)
    val fs = w * 3 * h
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.frame_idx == i && f.width == w && f.height == h && f.n_px == w * h)
      val vals = (0 until fs).map(k => (seed + i.toLong * fs + k) % 256)
      assert(f.pix_sum == vals.sum)
      assert(f.pix_sq_sum == vals.map(v => v * v).sum)
      assert(f.first_px == vals.take(3).sum)
    }
    // D1 sniff reads the avih main header through the LIST nesting
    val meta = graft.functions.Metadata.sniff(avi)
    assert(meta("mime") == "video/avi" && meta("width") == "5" &&
      meta("height") == "3" && meta("n_frames") == "3")
    // structural gates: None, never garbage
    assert(Multimodal.decodeAvi(avi.take(40)).isEmpty) // truncated
    val wrongForm = avi.clone(); wrongForm(8) = 'W'
    assert(Multimodal.decodeAvi(wrongForm).isEmpty)
    val hugeDims = avi.clone()
    // strf biWidth lives after RIFF(12) + LIST hdr(12) + avih(8+56) + LIST(12) + strh(8+56) + strf hdr(8) + biSize(4)
    val strfW = 12 + 12 + 64 + 12 + 64 + 8 + 4
    hugeDims(strfW + 2) = 0x7f // width beyond the 2^12 bound
    assert(Multimodal.decodeAvi(hugeDims).isEmpty)
  }

  test("decodeMp4: closed-form RGB24 samples through the real ISO-BMFF walk") {
    val (seed, w, h, nf, delta) = (53L, 5, 3, 4, 33)
    val mp4 = Multimodal.synthMp4(seed, w, h, nf, delta)
    val frames = Multimodal.decodeMp4(mp4).get
    assert(frames.size == nf)
    val fs = w * h * 3
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.frame_idx == i && f.width == w && f.height == h &&
        f.n_px == w * h && f.dur_ticks == delta)
      val vals = (0 until fs).map(k => (seed + i.toLong * fs + k) % 256)
      assert(f.pix_sum == vals.sum)
      assert(f.pix_sq_sum == vals.map(v => v * v).sum)
      assert(f.first_px == vals.take(3).sum)
    }
    // the two-chunk stsc/stco split means samples 1..n-1 sit at offsets
    // the decoder can only find by actually running the sample-to-chunk
    // run expansion — a single-chunk assumption would misplace frame 2+
    val single = Multimodal.decodeMp4(Multimodal.synthMp4(seed, w, h, 1, delta)).get
    assert(single.size == 1 && single.head.pix_sum == frames.head.pix_sum)
    // D1 sniff: brand, 16.16 tkhd dims, mvhd duration on the 1000 timescale
    val meta = graft.functions.Metadata.sniff(mp4)
    assert(meta("mime") == "video/mp4" && meta("brand") == "isom" &&
      meta("width") == "5" && meta("height") == "3" &&
      meta("duration_ms") == (nf * delta).toString)
    // structural gates: None, never garbage
    assert(Multimodal.decodeMp4(mp4.take(64)).isEmpty)       // truncated mid-moov
    assert(Multimodal.decodeMp4(mp4.dropRight(4)).isEmpty)   // mdat short of stsz
    val wrongBrand = mp4.clone(); wrongBrand(4) = 'x'        // no ftyp first box
    assert(Multimodal.decodeMp4(wrongBrand).isEmpty)
    val codec = new String(mp4, 0, mp4.length, "ISO-8859-1").indexOf("raw ")
    val notRaw = mp4.clone(); notRaw(codec) = 'j'            // unsupported codec
    assert(Multimodal.decodeMp4(notRaw).isEmpty)
    // sniff must TERMINATE on a corrupt top-level box size (zero/huge) —
    // a walk that doesn't advance would hang the ingest executor
    val zeroBox = mp4.clone()
    val ftypLen = 20
    zeroBox(ftypLen) = 0; zeroBox(ftypLen + 1) = 0
    zeroBox(ftypLen + 2) = 0; zeroBox(ftypLen + 3) = 0      // moov size = 0
    assert(graft.functions.Metadata.sniff(zeroBox)("mime") == "video/mp4")
    assert(Multimodal.decodeMp4(zeroBox).isEmpty)
  }

  test("decodeMp4: Motion-JPEG samples decode through the JDK's own codec") {
    val (w, h, nf, delta) = (16, 8, 3, 33)
    val jpegs = (0 until nf).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 16 + f * 32) << 16) | (y * 24 << 8) | 160)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mp4 = Multimodal.synthMp4Jpeg(jpegs, w, h, delta)
    val frames = Multimodal.decodeMp4(mp4).get
    assert(frames.size == nf)
    // non-uniform stsz + the two-chunk split: the walk must hand the JDK
    // codec each sample's EXACT bytes — stats equal a direct decode
    frames.zip(jpegs).zipWithIndex.foreach { case ((f, j), i) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j))
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }
      assert(f.width == w && f.height == h && f.pix_sum == sum &&
        f.dur_ticks == delta && f.frame_idx == i)
    }
  }

  test("decodeMkv: closed-form RGB24 blocks through the real EBML walk") {
    val (seed, w, h, nf, delta) = (71L, 5, 3, 4, 34)
    val mkv = Multimodal.synthMkv(seed, w, h, nf, delta)
    val frames = Multimodal.decodeMkv(mkv).get
    assert(frames.size == nf)
    val fs = w * h * 3
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.frame_idx == i && f.width == w && f.height == h &&
        f.n_px == w * h && f.ts_ms == i.toLong * delta)
      val vals = (0 until fs).map(k => (seed + i.toLong * fs + k) % 256)
      assert(f.pix_sum == vals.sum)
      assert(f.pix_sq_sum == vals.map(v => v * v).sum)
      assert(f.first_px == vals.take(3).sum)
    }
    // frame timestamps come from TWO containers: cluster Timestamp +
    // signed 16-bit block-relative ts — a walk that ignores either level
    // lands on the wrong ts_ms
    assert(frames.map(_.ts_ms) == (0 until nf).map(_.toLong * delta))
    val single = Multimodal.decodeMkv(Multimodal.synthMkv(seed, w, h, 1, delta)).get
    assert(single.size == 1 && single.head.pix_sum == frames.head.pix_sum)
    // structural gates: None, never garbage
    assert(Multimodal.decodeMkv(mkv.take(48)).isEmpty)     // truncated segment
    assert(Multimodal.decodeMkv(mkv.dropRight(3)).isEmpty) // short last block
    val wrongDoc = mkv.clone()
    val dt = new String(mkv, 0, mkv.length, "ISO-8859-1").indexOf("matroska")
    wrongDoc(dt) = 'x'
    assert(Multimodal.decodeMkv(wrongDoc).isEmpty)         // non-matroska DocType
    val codec = new String(mkv, 0, mkv.length, "ISO-8859-1").indexOf("V_UNCOMPRESSED")
    val notRaw = mkv.clone(); notRaw(codec) = 'X'
    assert(Multimodal.decodeMkv(notRaw).isEmpty)           // unsupported codec
  }

  test("decodeAvi: MJPEG frames decode through the JDK's own JPEG codec") {
    val (w, h, nf) = (16, 8, 2)
    val jpegs = (0 until nf).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 16 + f * 64) << 16) | (y * 24 << 8) | 128)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = Multimodal.synthAviMjpeg(jpegs, w, h)
    val frames = Multimodal.decodeAvi(avi).get
    assert(frames.size == nf)
    // container walk must hand each codec the EXACT chunk bytes: stats
    // equal a direct ImageIO decode of the same JPEGs
    frames.zip(jpegs).foreach { case (f, j) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j))
      assert(f.width == w && f.height == h && f.n_px == w * h)
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        sum += (rgb & 0xff) + ((rgb >> 8) & 0xff) + ((rgb >> 16) & 0xff)
      }
      assert(f.pix_sum == sum)
    }
    // frame payloads differ, so stats must differ (lossy but deterministic)
    assert(frames(0).pix_sum != frames(1).pix_sum)
  }

  test("fft: known spectra, Parseval energy, square-wave dominant bins") {
    import Multimodal.fft
    // impulse -> flat spectrum (all magnitudes 1)
    val re1 = Array.tabulate(8)(i => if (i == 0) 1.0 else 0.0)
    val im1 = new Array[Double](8)
    fft(re1, im1)
    for (b <- 0 until 8)
      assert(math.abs(math.hypot(re1(b), im1(b)) - 1.0) < 1e-9)
    // constant -> pure DC
    val re2 = Array.fill(8)(1.0); val im2 = new Array[Double](8)
    fft(re2, im2)
    assert(math.abs(re2(0) - 8.0) < 1e-9)
    for (b <- 1 until 8) assert(math.hypot(re2(b), im2(b)) < 1e-9)
    // Parseval: sum |x|^2 == (1/N) sum |X|^2 on a random signal
    val rnd = new scala.util.Random(3)
    val x = Array.fill(256)(rnd.nextDouble() * 2 - 1)
    val re3 = x.clone(); val im3 = new Array[Double](256)
    fft(re3, im3)
    val tEnergy = x.map(v => v * v).sum
    val fEnergy = (0 until 256).map(b => re3(b) * re3(b) + im3(b) * im3(b)).sum / 256
    assert(math.abs(tEnergy - fEnergy) < 1e-6 * tEnergy)
    // square waves land on the closed-form fundamental through the REAL
    // wav parse + fft path
    for (p <- Seq(8, 16, 32)) {
      val bin = Multimodal.dominantBin(Multimodal.synthWavSquare(p), 256)
      assert(bin.contains(256 / p), s"period $p -> $bin")
    }
    // non-PCM input stays None
    assert(Multimodal.dominantBin(Array[Byte](1, 2, 3), 256).isEmpty)
  }

  test("resizeBmpNearest: real pixel resample, output round-trips the codec") {
    // identity resize preserves every pixel statistic
    val src = Multimodal.synthBmp(31L, 4, 3)
    val id = Multimodal.resizeBmpNearest(src, 4, 3).get
    assert(Multimodal.decodeBmp(id).get == Multimodal.decodeBmp(src).get)
    // downsample: target (x,y) picks source (x*srcW/newW, y*srcH/newH)
    val down = Multimodal.decodeBmp(Multimodal.resizeBmpNearest(src, 2, 2).get).get
    def srcVal(px: Int, py: Int, c: Int): Long = {
      val sx = px * 4 / 2; val sy = py * 3 / 2
      (31L + (sy * 4 + sx) * 3 + c) % 256
    }
    val want = for (py <- 0 to 1; px <- 0 to 1; c <- 0 to 2) yield srcVal(px, py, c)
    assert(down.width == 2 && down.height == 2)
    assert(down.pix_sum == want.sum && down.pix_sq_sum == want.map(v => v * v).sum)
    assert(down.first_px == srcVal(0, 0, 0) + srcVal(0, 0, 1) + srcVal(0, 0, 2))
    // upsample replicates nearest pixels; top-down sources resize too
    val up = Multimodal.decodeBmp(Multimodal.resizeBmpNearest(src, 8, 6).get).get
    assert(up.n_px == 48 && up.first_px == down.first_px)
    assert(Multimodal.resizeBmpNearest(bmp2x2(true), 1, 1).flatMap(Multimodal.decodeBmp)
      .get.first_px == 1 + 2 + 3)
    // garbage in -> None, never a corrupt image out
    assert(Multimodal.resizeBmpNearest(Array[Byte](1, 2, 3), 2, 2).isEmpty)
  }

  test("realDecoder: real stats for bmp/png/wav, declared stub for the rest") {
    import spark.implicits._
    val rows = Seq(
      (10L, "image", Multimodal.synthBmp(31L, 4, 3)),
      (11L, "audio", Multimodal.synthWav(7L, 64)),
      (12L, "image", png(64, 32)),
      (13L, "image", Multimodal.synthPng(31L, 4, 6)))
      .toDF("media_id", "kind", "content")
    val feats = Multimodal.pipeline(spark, rows, featureDim = 8,
        decoder = Multimodal.realDecoder)
      .collect().map(f => f.media_id -> f).toMap
    val bs = Multimodal.decodeBmp(Multimodal.synthBmp(31L, 4, 3)).get
    val mean = bs.pix_sum / (bs.n_px * 3.0)
    assert(math.abs(feats(10L).features(0) - mean / 255.0) < 1e-6)
    assert(feats(10L).width == 4 && feats(10L).height == 3) // sniffed header dims
    val ws = Multimodal.decodeWav(Multimodal.synthWav(7L, 64)).get
    assert(math.abs(feats(11L).features(1) -
      math.sqrt(ws.smp_sq_sum / 64.0) / 32768.0) < 1e-6)
    // a header-only (truncated) png falls through the seam to the stub
    assert(feats(12L).features.toSeq ==
      Multimodal.decodeStub.decode(Multimodal.MediaRow(12L, "image",
        png(64, 32), "image/png", 64, 32, -1, -1L), 8).features.toSeq)
    // a complete png decodes for real: mean of the closed-form pixels
    val ps = Multimodal.decodePng(Multimodal.synthPng(31L, 4, 6)).get
    assert(math.abs(feats(13L).features(0) -
      ps.pix_sum / (ps.n_px * 3.0) / 255.0) < 1e-6)
    assert(feats(13L).width == 4 && feats(13L).height == 6)
  }

  test("realDecoder: video containers (avi/mp4/mkv) decode for real") {
    import spark.implicits._
    val rows = Seq(
      (20L, "video", Multimodal.synthAvi(11L, 4, 3, 2)),
      (21L, "video", Multimodal.synthMp4(13L, 4, 3, 3, 40)),
      (22L, "video", Multimodal.synthMkv(17L, 4, 3, 3, 40)))
      .toDF("media_id", "kind", "content")
    // sniff routes each container family (EBML branch is new)
    assert(graft.functions.Metadata.sniff(
      Multimodal.synthMkv(17L, 4, 3, 3, 40))("mime") == "video/x-matroska")
    val feats = Multimodal.pipeline(spark, rows, featureDim = 8,
        decoder = Multimodal.realDecoder)
      .collect().map(f => f.media_id -> f).toMap
    // pooled mean over ALL frames equals the closed form: byte k of frame
    // f is (seed + f*36 + k) % 256 over 36 bytes/frame
    def meanOf(seed: Long, frames: Int): Double =
      (0 until frames).flatMap(f =>
        (0 until 36).map(k => (seed + f * 36 + k) % 256)).sum / (frames * 36.0)
    assert(math.abs(feats(20L).features(0) - meanOf(11L, 2) / 255.0) < 1e-6)
    assert(math.abs(feats(21L).features(0) - meanOf(13L, 3) / 255.0) < 1e-6)
    assert(math.abs(feats(22L).features(0) - meanOf(17L, 3) / 255.0) < 1e-6)
    // n_frames is the real decoded frame count, not a stub constant
    assert(feats(20L).n_frames == 2 && feats(21L).n_frames == 3 &&
      feats(22L).n_frames == 3)
  }

  test("dHash: deterministic 64-bit perceptual hash, brightness twins collide") {
    // closed-form recompute of one hash: multiplicative 5x3 BMP, 9x8
    // nearest-neighbor resample, integer grayscale, adjacent comparisons
    val img = Multimodal.synthBmpMul(38L, 0, 5, 3)
    def srcByte(k: Long): Int = (((38L * (k + 3) + 0) % 256 + 256) % 256).toInt
    def gray(x: Int, y: Int): Int = {
      val sx = x * 5 / 9; val sy = y * 3 / 8
      val base = sy.toLong * 15 + sx * 3
      (srcByte(base) + srcByte(base + 1) + srcByte(base + 2)) / 3
    }
    var want = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (gray(x, y) > gray(x + 1, y)) want |= 1L << (y * 8 + x)
    assert(Multimodal.dHash(img).get == want)
    // determinism and stability under identity resize
    assert(Multimodal.dHash(img) == Multimodal.dHash(img))
    // a +1 global brightness shift is a near-duplicate: hamming stays small
    val twin = Multimodal.synthBmpMul(38L, 1, 5, 3)
    val ham = java.lang.Long.bitCount(
      Multimodal.dHash(img).get ^ Multimodal.dHash(twin).get)
    assert(ham <= 6, s"twin hamming $ham")
    // garbage in -> None, never a bogus hash
    assert(Multimodal.dHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("dHashAny: BMP and PNG containers of the same pixels hash identically") {
    for (seed <- Seq(7L, 38L, 1234L); (w, h) <- Seq((5, 3), (9, 8), (16, 11))) {
      val viaBmp = Multimodal.dHashAny(Multimodal.synthBmpMul(seed, 0, w, h))
      val viaPng = Multimodal.dHashAny(Multimodal.synthPngMul(seed, 0, w, h))
      assert(viaBmp.isDefined && viaBmp == viaPng, s"seed=$seed ${w}x$h")
    }
    // the transcode really is the full pipeline: pngToBmp output decodes
    // to the same pixel statistics the PNG decoder reports
    val png = Multimodal.synthPng(31L, 4, 6)
    val viaTranscode = Multimodal.pngToBmp(png).flatMap(Multimodal.decodeBmp)
    assert(viaTranscode.map(s => (s.pix_sum, s.pix_sq_sum, s.n_px)) ==
      Multimodal.decodePng(png).map(s => (s.pix_sum, s.pix_sq_sum, s.n_px)))
    // unknown containers stay None
    assert(Multimodal.dHashAny("GIF89a??????".getBytes).isEmpty)
    assert(Multimodal.dHashAny(Array[Byte](1, 2)).isEmpty)
  }

  test("features feed the standard vector ops (cosine knn over media)") {
    import spark.implicits._
    val feats = Multimodal.pipeline(spark, raw).toDF()
    val pairs = feats.as("x").join(feats.as("y"),
        col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id"), col("y.media_id"),
        graft.functions.Vectors.cosine(col("x.features"), col("y.features")).as("cos"))
    assert(pairs.count() == 6)
    assert(pairs.filter(col("cos").isNull).isEmpty)
  }

  test("mm_scene_cuts: real gradient, flags match the integer rule, decode-backed") {
    val rows = SparkEntry.queries("mm_scene_cuts")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val cuts = rows.count(_.getAs[Int]("is_cut") == 1)
    // the detector must actually discriminate: some transitions cut, most don't
    assert(cuts > 0 && cuts < rows.length)
    // every delta re-verifies against an independent decode of the same synth GIF
    val byMedia = rows.groupBy(_.getAs[Long]("media_id"))
    byMedia.take(5).foreach { case (id, rs) =>
      val gif = Multimodal.synthGif(id * 13, (id % 3 + 3).toInt, 4, (id % 3 + 2).toInt)
      val frames = Multimodal.decodeGif(gif).get.sortBy(_.frame_idx)
      val expected = frames.sliding(2).map { case Seq(a, b) =>
        (b.frame_idx, math.abs(b.px_sum - a.px_sum))
      }.toMap
      rs.foreach { r =>
        assert(r.getAs[Long]("delta_sum") == expected(r.getAs[Int]("frame_idx")))
      }
    }
  }
}
