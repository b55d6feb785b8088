package graft.ops

import graft.SparkSpecBase
import graft.ops.Multimodal._

/** Multimodal plumbing: binary columns + typed metadata through per-partition
  * batch transforms. Images decode for real (javax.imageio); audio/video use
  * the deterministic stub codec — the Spark-side contract is tested
  * either way.
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def items = Seq(
    MediaItem(1L, "image-bytes-one".getBytes("UTF-8"), MediaMeta("image", "png", 64, 64, 0L)),
    MediaItem(2L, "audio-bytes".getBytes("UTF-8"), MediaMeta("audio", "wav", 0, 0, 2000L)),
    MediaItem(3L, "video-bytes-for-frame-sampling".getBytes("UTF-8"), MediaMeta("video", "mp4", 64, 64, 5000L)),
    MediaItem(4L, null, MediaMeta("image", "png", 64, 64, 0L)),
  ).toDS()

  test("extractFeatures: one row per item, fixed dim, deterministic, null-safe") {
    val out = extractFeatures(items, dim = 8).collect().sortBy(_.id)
    assert(out.length === 4)
    assert(out.forall(_.features.length === 8))
    assert(out(3).features.forall(_ === 0.0f)) // null bytes → zero vector
    val again = extractFeatures(items, dim = 8).collect().sortBy(_.id)
    assert(out.map(_.features.toSeq) === again.map(_.features.toSeq))
    assert(out(0).features.toSeq !== out(1).features.toSeq)
  }

  test("sampleFrames: only video rows emit, n frames, indexed") {
    val frames = sampleFrames(items, framesPerVideo = 3).collect()
    assert(frames.forall(_.id === 3L))
    assert(frames.map(_.frameIndex).sorted.toSeq === Seq(0, 1, 2))
    assert(frames.forall(_.frameBytes.nonEmpty))
  }

  test("resize rewrites metadata, passes bytes through") {
    val out = resize(items, 32, 16).collect().sortBy(_.id)
    assert(out.forall(m => m.meta.width === 32 && m.meta.height === 16))
    assert(out(0).bytes.toSeq === items.collect().sortBy(_.id).apply(0).bytes.toSeq)
  }

  test("demoMediaFromText assigns kinds round-robin and preserves ids") {
    val df = Seq((0L, "aaa"), (1L, "bbb"), (2L, "ccc")).toDF("id", "text")
    val media = demoMediaFromText(df, "id", "text").collect().sortBy(_.id)
    assert(media.map(_.meta.kind).toSeq === Seq("image", "audio", "video"))
  }

  test("featureStatsByKind aggregates deterministically per kind") {
    val df = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"), (3L, "delta")).toDF("id", "text")
    val out = featureStatsByKind(df, "id", "text", dim = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("audio", 1L), ("image", 2L), ("video", 1L)))
  }

  test("metaStatsByKind: hand-computed integer stats, frame arithmetic exact") {
    // ids 2 and 5 are videos: "gamma" (5 bytes → 4 frames, 4·⌊5/4⌋ = 4
    // frame bytes), "ee" (2 bytes < 4 → 4 frames of 1 byte each)
    val df = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"), (3L, "delta"),
      (4L, null.asInstanceOf[String]), (5L, "ee")).toDF("id", "text")
    val out = metaStatsByKind(df, "id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    //            kind     n  bytes  width dur    frames framebytes
    assert(out === Seq(
      ("audio", 2L, 4L + 0L, 128L, 2000L, 0L, 0L),       // "beta", null
      ("image", 2L, 5L + 5L, 128L, 0L, 0L, 0L),          // "alpha", "delta"
      ("video", 2L, 5L + 2L, 128L, 2000L, 8L, 4L + 4L))) // "gamma", "ee"
  }

  // ---- real image decode (javax.imageio — PNG generated in-test) ----

  /** 4x2 PNG: left half black, right half white — lossless, so decode
    * recovers the exact pixels on any JDK.
    */
  private def testPng(w: Int = 4, h: Int = 2): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    ImageCodec.encodePng(img)
  }

  test("ImageCodec decodes a real PNG and pools luminance features") {
    val png = testPng()
    val img = ImageCodec.decode(png).get
    assert(img.getWidth === 4 && img.getHeight === 2)
    // dim=2 pools raster halves: row-major first half {B,B,W,W,B,B,W,W}[0..3]
    // averages 0.5 in each cell (black=0, white=1)
    val feats = ImageCodec.extractFeatures(img, 2)
    assert(feats.length === 2)
    assert(math.abs(feats(0) - 0.5f) < 1e-3 && math.abs(feats(1) - 0.5f) < 1e-3)
    // full-resolution pooling (dim = pixel count) recovers per-pixel luminance
    val perPixel = ImageCodec.extractFeatures(img, 8).toSeq
    assert(perPixel === Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f))
  }

  test("extractFeatures uses the real decoder for decodable images") {
    val real = Seq(
      MediaItem(1L, testPng(), MediaMeta("image", "png", 4, 2, 0L)),
    ).toDS()
    val out = extractFeatures(real, dim = 8).collect().head
    // decoded-pixel features, not the hash stub: exact luminance values
    assert(out.features.toSeq === Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f))
    // undecodable "image" bytes still flow through the stub (no nulls/crash)
    val fake = extractFeatures(items, dim = 8).collect().sortBy(_.id)
    assert(fake.forall(_.features.length === 8))
  }

  // ---- real audio decode (javax.sound.sampled — WAV generated in-test) ----

  /** Mono 16-bit little-endian WAV: first half silence, second half a
    * constant ±amp square wave (RMS exactly amp).
    */
  private def testWav(frames: Int = 1000, amp: Double = 0.5): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    for (f <- frames / 2 until frames) {
      val v = (if (f % 2 == 0) amp else -amp) * 32768.0
      val s = math.max(-32768, math.min(32767, v.toInt)).toShort
      pcm(f * 2) = (s & 0xff).toByte
      pcm(f * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio dHash: gain- and duration-invariant on the same profile, far on different content") {
    // square wave whose per-130-frame block amplitude follows a seeded
    // pseudo-random profile — a rich energy contour the hash bits track
    def profiledWav(frames: Int, gain: Double, seed: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](frames * 2)
      for (f <- 0 until frames) {
        val block = f * 65 / frames // align blocks to the hash windows
        val amp = gain * (((block * 37 + seed) % 100) + 1) / 101.0
        val v = (if (f % 2 == 0) amp else -amp) * 32767.0
        val s = math.max(-32768, math.min(32767, v.toInt)).toShort
        pcm(f * 2) = (s & 0xff).toByte
        pcm(f * 2 + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    def hash(b: Array[Byte]): Long = AudioCodec.dHash(AudioCodec.decode(b).get)
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val a = hash(profiledWav(6500, 1.0, seed = 1))
    // re-leveled copy (half gain): energy comparisons scale together
    assert(hash(profiledWav(6500, 0.5, seed = 1)) === a)
    // same content at double duration: windows are proportional
    assert(hamming(hash(profiledWav(13000, 1.0, seed = 1)), a) <= 4)
    // different content is far
    assert(hamming(hash(profiledWav(6500, 1.0, seed = 55)), a) >= 16)
    // end-to-end: hashes + the shared pigeonhole pairing find the twin
    val items = Seq(
      MediaItem(1L, profiledWav(6500, 1.0, 1), MediaMeta("audio", "wav", 0, 0, 0L)),
      MediaItem(2L, profiledWav(6500, 0.25, 1), MediaMeta("audio", "wav", 0, 0, 0L)),
      MediaItem(3L, profiledWav(6500, 1.0, 55), MediaMeta("audio", "wav", 0, 0, 0L)),
    ).toDS()
    val pairs = Multimodal.imageNearDupPairs(
        Multimodal.audioDHashes(items), maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("video near-dup: identical footage in different containers pairs frame by frame") {
    // structured JPEG frames (vertical block patterns, phase-shifted per
    // frame) so frame hashes are distinctive — solid frames hash 0
    def patternJpeg(phase: Int, vertical: Boolean, w: Int = 64): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, w,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until w) {
        val band = if (vertical) x else y
        val on = ((band * 8 / w) + phase) % 2 == 0
        img.setRGB(x, y, if (on) 0xffffff else 0x000000)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // video 2 = the same frames re-containered with a different cadence;
    // video 3 = genuinely different footage (horizontal stripes — a
    // column-comparison dHash sees a flat profile, far from A's)
    val fsA = (0 until 4).map(i => patternJpeg(i, vertical = true))
    val fsC = (0 until 4).map(i => patternJpeg(i, vertical = false))
    val items = Seq(
      MediaItem(1L, testAvi(fsA), MediaMeta("video", "avi", 64, 64, 0L)),
      MediaItem(2L, testAvi(fsA, microSecPerFrame = 20000), MediaMeta("video", "avi", 64, 64, 0L)),
      MediaItem(3L, testAvi(fsC), MediaMeta("video", "avi", 64, 64, 0L)),
    ).toDS()
    val hashes = Multimodal.videoFrameDHashes(items, framesPerVideo = 4)
    assert(hashes.count() === 12)
    val pairs = Multimodal.videoNearDupPairs(hashes, maxHamming = 6,
        minMatchingFrames = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("AudioCodec decodes WAV/PCM and pools RMS energy features") {
    val samples = AudioCodec.decode(testWav()).get
    assert(samples.length === 1000)
    assert(samples.take(10).forall(_ === 0.0))
    // dim=2 pools halves: silence then the square wave at RMS = amp
    val feats = AudioCodec.extractFeatures(samples, 2)
    assert(feats.length === 2)
    assert(feats(0) === 0.0f)
    assert(math.abs(feats(1) - 0.5f) < 1e-3)
  }

  test("extractFeatures uses the real audio decoder for WAV items") {
    val real = Seq(
      MediaItem(1L, testWav(), MediaMeta("audio", "wav", 0, 0, 125L)),
    ).toDS()
    val out = extractFeatures(real, dim = 2).collect().head
    assert(out.kind === "audio")
    assert(out.features(0) === 0.0f && math.abs(out.features(1) - 0.5f) < 1e-3)
  }

  // ---- real MP4 container parsing (ISO-BMFF box walk, built in-test) ----

  /** Minimal valid ISO-BMFF: `ftyp` (major brand isom) + `moov`/`mvhd` v0
    * with timescale 1000 and duration 5000 units = 5000 ms.
    */
  private def testMp4(timescale: Int = 1000, duration: Int = 5000): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(16 + 36)
    out.putInt(16).put("ftyp".getBytes("ISO-8859-1"))
      .put("isom".getBytes("ISO-8859-1")).putInt(0)
    out.putInt(36).put("moov".getBytes("ISO-8859-1"))
    out.putInt(28).put("mvhd".getBytes("ISO-8859-1"))
      .putInt(0)          // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(timescale).putInt(duration)
    out.array()
  }

  test("VideoCodec parses ftyp brand and mvhd duration from an MP4 box tree") {
    val meta = VideoCodec.parseMeta(testMp4()).get
    assert(meta.majorBrand === "isom")
    assert(meta.durationMs === 5000L)
    // 90kHz timescale (the common video clock) converts correctly
    assert(VideoCodec.parseMeta(testMp4(90000, 90000 * 7)).get.durationMs === 7000L)
    // non-MP4 bytes refuse rather than guess
    assert(VideoCodec.parseMeta("not a video".getBytes("UTF-8")) === None)
    assert(VideoCodec.parseMeta(Array.emptyByteArray) === None)
  }

  test("refreshVideoMeta stamps measured duration/brand on parseable videos only") {
    val in = Seq(
      MediaItem(1L, testMp4(), MediaMeta("video", "mp4", 64, 64, 999L)),
      MediaItem(2L, "garbage-bytes".getBytes("UTF-8"), MediaMeta("video", "mp4", 64, 64, 777L)),
      MediaItem(3L, testMp4(), MediaMeta("audio", "wav", 0, 0, 111L)), // not video: untouched
    ).toDS()
    val out = refreshVideoMeta(in).collect().sortBy(_.id)
    assert(out(0).meta.durationMs === 5000L && out(0).meta.format === "isom")
    assert(out(1).meta.durationMs === 777L && out(1).meta.format === "mp4")
    assert(out(2).meta.durationMs === 111L)
  }

  // ---- real MJPEG-AVI frame decode (RIFF container built in-test) ----

  /** One-color JPEG frame via javax.imageio. */
  private def jpegFrame(rgb: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal RIFF/AVI per the public AVI form: `hdrl` list holding `avih`
    * (cadence + frame count), then a `movi` list of `00dc` MJPEG chunks
    * (WORD-aligned, as the spec requires).
    */
  private def testAvi(frames: Seq[Array[Byte]], microSecPerFrame: Int = 40000): Array[Byte] = {
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(cc.getBytes("ISO-8859-1")).putInt(payload.length).put(payload)
      b.array()
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val body = bodies.flatten.toArray
      val b = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("ISO-8859-1")).putInt(4 + body.length)
        .put(listType.getBytes("ISO-8859-1")).put(body)
      b.array()
    }
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length) // dwTotalFrames at +16
      .array()
    val body = list("hdrl", Seq(chunk("avih", avih))) ++
      list("movi", frames.map(chunk("00dc", _)))
    val b = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ISO-8859-1")).putInt(4 + body.length)
      .put("AVI ".getBytes("ISO-8859-1")).put(body)
    b.array()
  }

  test("VideoCodec parses avih cadence/frames and extracts MJPEG frames") {
    val fs = Seq(jpegFrame(0xff0000), jpegFrame(0x00ff00), jpegFrame(0x0000ff))
    val avi = testAvi(fs, microSecPerFrame = 40000) // 25 fps, 3 frames = 120 ms
    assert(VideoCodec.parseAviMeta(avi).get.durationMs === 120L)
    val got = VideoCodec.mjpegFrames(avi)
    assert(got.length === 3)
    assert(got.map(_.toSeq) === fs.map(_.toSeq)) // byte-exact round trip
    assert(VideoCodec.mjpegFrames("not an avi".getBytes("UTF-8")).isEmpty)
  }

  test("sampleFrames returns REAL decodable JPEG frames from an MJPEG AVI") {
    val fs = (0 until 5).map(i => jpegFrame(0x010101 * (40 * i + 20)))
    val in = Seq(
      MediaItem(1L, testAvi(fs), MediaMeta("video", "avi", 8, 8, 0L)),
    ).toDS()
    val out = sampleFrames(in, framesPerVideo = 3).collect().sortBy(_.frameIndex)
    assert(out.length === 3)
    // evenly spaced, first and last included: source frames 0, 2, 4
    val decoded = out.map(f => javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(f.frameBytes)))
    assert(decoded.forall(_ != null), "frames must decode as JPEG")
    val brightness = decoded.map(img => img.getRGB(4, 4) & 0xff)
    assert(brightness(0) < brightness(1) && brightness(1) < brightness(2),
      s"expected frames from start/middle/end, got brightness ${brightness.toSeq}")
    // refreshVideoMeta stamps the AVI's measured duration too
    val refreshed = refreshVideoMeta(in).collect().head
    assert(refreshed.meta.format === "avi" && refreshed.meta.durationMs === 200L)
  }

  /** Animated GIF golden, built frame-by-frame with per-frame metadata:
    * full first frame, then a 2×2 delta patch at (2,2) with doNotDispose —
    * real inter-frame compositing is required to reconstruct frame 2.
    */
  private def testGif(disposal: String = "doNotDispose"): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    import java.awt.image.BufferedImage
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    def frame(img: BufferedImage, x: Int, y: Int): Unit = {
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def node(name: String): IIOMetadataNode = {
        var c = root.getFirstChild
        while (c != null) {
          if (c.getNodeName == name) return c.asInstanceOf[IIOMetadataNode]
          c = c.getNextSibling
        }
        val n = new IIOMetadataNode(name)
        root.appendChild(n)
        n
      }
      val gce = node("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10") // 100 ms
      gce.setAttribute("transparentColorIndex", "0")
      val desc = node("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", x.toString)
      desc.setAttribute("imageTopPosition", y.toString)
      desc.setAttribute("imageWidth", img.getWidth.toString)
      desc.setAttribute("imageHeight", img.getHeight.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), writer.getDefaultWriteParam)
    }
    def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb))
      g.fillRect(0, 0, w, h)
      g.dispose()
      img
    }
    frame(solid(6, 6, 0xff0000), 0, 0)  // full red base frame
    frame(solid(2, 2, 0x0000ff), 2, 2)  // blue delta patch at (2,2)
    writer.endWriteSequence()
    ios.close()
    out.toByteArray
  }

  test("GifCodec composites real inter-frame deltas across disposal state") {
    val gif = testGif()
    assert(GifCodec.isGif(gif))
    val meta = GifCodec.parseMeta(gif).get
    assert(meta.frameCount === 2 && meta.durationMs === 200L)
    val frames = GifCodec.frames(gif).map(b =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    assert(frames.length === 2)
    // frame 1: all red
    assert((frames(0).getRGB(0, 0) & 0xffffff) === 0xff0000)
    assert((frames(0).getRGB(3, 3) & 0xffffff) === 0xff0000)
    // frame 2: the 2x2 delta patch landed at (2,2) ON TOP of the carried
    // canvas — corners stay red (the compositing the stub can't fake)
    assert((frames(1).getRGB(3, 3) & 0xffffff) === 0x0000ff)
    assert((frames(1).getRGB(0, 0) & 0xffffff) === 0xff0000)
    assert((frames(1).getRGB(5, 5) & 0xffffff) === 0xff0000)
    assert(GifCodec.frames("not a gif".getBytes("UTF-8")).isEmpty)
  }

  test("sampleFrames and refreshVideoMeta use the real GIF path") {
    val in = Seq(MediaItem(9L, testGif(), MediaMeta("video", "gif", 6, 6, 0L))).toDS()
    val out = sampleFrames(in, framesPerVideo = 2).collect().sortBy(_.frameIndex)
    assert(out.length === 2)
    val f2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1).frameBytes))
    assert((f2.getRGB(3, 3) & 0xffffff) === 0x0000ff)
    val refreshed = refreshVideoMeta(in).collect().head
    assert(refreshed.meta.format === "gif" && refreshed.meta.durationMs === 200L)
  }

  test("dHash: scale-invariant on block patterns, complementary on inversion; banded pairs find near-dups") {
    // an 8-column vertical block pattern rendered at two resolutions —
    // the same PICTURE, different pixels: the perceptual hash must land
    // within a small hamming budget (identical blocks sample identically
    // up to boundary pixels under nearest-neighbor)
    def blocksPng(w: Int, h: Int, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val on = (x * 8 / w) % 2 == 0
        img.setRGB(x, y, if (on != invert) 0xffffff else 0x000000)
      }
      ImageCodec.encodePng(img)
    }
    val a64 = ImageCodec.dHash(ImageCodec.decode(blocksPng(64, 64, invert = false)).get)
    val a128 = ImageCodec.dHash(ImageCodec.decode(blocksPng(128, 128, invert = false)).get)
    val bInv = ImageCodec.dHash(ImageCodec.decode(blocksPng(64, 64, invert = true)).get)
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(a64, a128) <= 4, s"rescaled twin drifted: ${hamming(a64, a128)} bits")
    assert(hamming(a64, bInv) >= 30, s"inverted image too close: ${hamming(a64, bInv)} bits")
    // identical bytes hash identically
    assert(ImageCodec.dHash(ImageCodec.decode(blocksPng(64, 64, invert = false)).get) === a64)

    // end-to-end: hashes from MediaItems, banded pairing finds the
    // rescaled twin and nothing else
    val items = Seq(
      MediaItem(1L, blocksPng(64, 64, invert = false), MediaMeta("image", "png", 64, 64, 0L)),
      MediaItem(2L, blocksPng(128, 128, invert = false), MediaMeta("image", "png", 128, 128, 0L)),
      MediaItem(3L, blocksPng(64, 64, invert = true), MediaMeta("image", "png", 64, 64, 0L)),
      MediaItem(4L, "not an image".getBytes("UTF-8"), MediaMeta("image", "png", 0, 0, 0L)),
    ).toDS()
    val hashes = Multimodal.imageDHashes(items)
    assert(hashes.count() === 3) // undecodable bytes drop
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("resize really rescales decodable images and re-encodes PNG") {
    val real = Seq(
      MediaItem(1L, testPng(4, 2), MediaMeta("image", "png", 4, 2, 0L)),
    ).toDS()
    val out = resize(real, 2, 1).collect().head
    assert(out.meta.width === 2 && out.meta.height === 1 && out.meta.format === "png")
    val img = ImageCodec.decode(out.bytes).get
    assert(img.getWidth === 2 && img.getHeight === 1)
    // nearest-neighbor of (black,black,white,white) at width 2 = (black,white)
    assert((img.getRGB(0, 0) & 0xffffff) === 0x000000)
    assert((img.getRGB(1, 0) & 0xffffff) === 0xffffff)
  }
}
