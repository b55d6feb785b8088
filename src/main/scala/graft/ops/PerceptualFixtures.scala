package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.ops.Multimodal.{MediaItem, MediaMeta}

/** Deterministic in-code media corpora for the perceptual-dedup
  * certification queries (`dedup_perceptual_{image,audio,video}`): real
  * PNG/WAV/MJPEG-AVI payloads whose content derives only from integer
  * parameters, so the full real-codec pipeline — render → encode → decode →
  * dHash → banded pairing — produces hashes a DuckDB oracle can pin as
  * literals and re-pair from the hash table down (the
  * `dedup_simhash_portable` pattern: the engine runs the scale mechanism,
  * the oracle reruns the integer pipeline bit for bit; here the hash-match
  * additionally certifies the codec chain's determinism, because the oracle
  * pins the hashes the codecs must reproduce).
  *
  * The parquet testdata has no binary media columns — these corpora are the
  * media-bearing equivalent of a fixture table, generated ON THE EXECUTORS
  * from `spark.range` so the render/encode work distributes like any real
  * decode stage.
  *
  * Content design (ids = `seed * 10 + variant`):
  *  - images: a 9×8 cell grid (dHash's exact sample grid) of black/white
  *    cells pseudo-randomly on per seed; variant 0 renders at 72×64,
  *    variant 1 at 144×128 (a RESCALED copy — nearest-neighbor sampling
  *    lands in the same cells, so the perceptual hash must match), variant
  *    2 inverts every cell (complementary hash — the far foil).
  *  - audio: a square wave whose per-window amplitude follows a seeded
  *    profile aligned to the hash's 65 energy windows; variant 0 at unit
  *    gain, variant 1 at quarter gain (a RE-LEVELED copy — gain-invariant,
  *    identical hash), variant 2 at double duration (windows are
  *    proportional — near-identical hash).
  *  - video: 4 MJPEG frames of phase-shifted vertical block stripes per
  *    seed; variant 0 at 25 fps, variant 1 the same frame bytes
  *    re-containered at 50 fps (a RE-MUXED copy — frame hashes identical).
  */
object PerceptualFixtures {

  // ---- image fixtures -----------------------------------------------------

  /** Pseudo-random cell color with real avalanche (a linear lattice mod a
    * small prime correlates heavily across nearby seeds — measured
    * cross-seed dHash hamming as low as 1): fmix32-style multiplicative
    * mixing makes distinct seeds produce decorrelated grids (~32/64 bits
    * apart), so "different content is far" holds by construction.
    */
  private def cellOn(seed: Int, cx: Int, cy: Int): Boolean = {
    var h = seed * 0x9e3779b9 + cx * 0x85ebca6b + cy * 0xc2b2ae35
    h ^= h >>> 16; h *= 0x45d9f3b; h ^= h >>> 16
    (h & 1) == 1
  }

  /** Render the 9×8 cell grid for `seed` at `scale` pixels per cell,
    * optionally inverted or lightly edited (two cells toggled — the
    * "cropped watermark" stand-in whose hash lands a FEW bits away, so the
    * Hamming verify is exercised at nonzero distances), as lossless PNG.
    */
  def gridPng(seed: Int, scale: Int, invert: Boolean,
      tweak: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9 * scale, 8 * scale, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8 * scale) {
      var x = 0
      while (x < 9 * scale) {
        val cx = x / scale; val cy = y / scale
        val base = cellOn(seed, cx, cy) ^ invert
        val on =
          if (tweak && ((cx == 0 && cy == 0) || (cx == 4 && cy == 3))) !base
          else base
        img.setRGB(x, y, if (on) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    Multimodal.ImageCodec.encodePng(img)
  }

  def imageItems(spark: SparkSession, seeds: Int = 4): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(seeds * 4L).map { i =>
      val seed = (i / 4).toInt
      val variant = (i % 4).toInt
      val scale = if (variant == 1) 16 else 8
      val bytes = gridPng(seed, scale,
        invert = variant == 2, tweak = variant == 3)
      MediaItem(seed * 10L + variant, bytes,
        MediaMeta("image", "png", 9 * scale, 8 * scale, 0L))
    }
  }

  // ---- audio fixtures -----------------------------------------------------

  /** 16-bit mono PCM WAV: square wave, per-hash-window amplitude from a
    * seeded integer profile (the energy contour the audio dHash tracks).
    */
  def profiledWav(frames: Int, gain: Double, seed: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    var f = 0
    while (f < frames) {
      val window = f * 65 / frames
      val amp = gain * (((window * 37 + seed * 29) % 100) + 1) / 101.0
      val v = (if (f % 2 == 0) amp else -amp) * 32767.0
      val s = math.max(-32768, math.min(32767, v.toInt)).toShort
      pcm(f * 2) = (s & 0xff).toByte
      pcm(f * 2 + 1) = ((s >> 8) & 0xff).toByte
      f += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def audioItems(spark: SparkSession, seeds: Int = 4): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(seeds * 3L).map { i =>
      val seed = (i / 3).toInt
      val variant = (i % 3).toInt
      val frames = if (variant == 2) 13000 else 6500
      val gain = if (variant == 1) 0.25 else 1.0
      MediaItem(seed * 10L + variant, profiledWav(frames, gain, seed),
        MediaMeta("audio", "wav", 0, 0, frames / 8L))
    }
  }

  // ---- video fixtures -----------------------------------------------------

  /** One video frame: the seeded 9×8 block grid (same pseudo-random family
    * as the image fixtures, mixed on `seed·4 + phase` so every frame of
    * every seed is distinct content), JPEG-encoded — blocks are bold enough
    * that the lossy encode round-trips to a stable dHash.
    */
  def stripeJpeg(seed: Int, phase: Int, scale: Int = 8): Array[Byte] = {
    val s = seed * 4 + phase
    val img = new java.awt.image.BufferedImage(
      9 * scale, 8 * scale, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8 * scale) {
      var x = 0
      while (x < 9 * scale) {
        val on = cellOn(s, x / scale, y / scale)
        img.setRGB(x, y, if (on) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Minimal RIFF/AVI MJPEG container: `avih` header (cadence, frame count)
    * + one `00dc` JPEG chunk per frame — the shape
    * [[Multimodal.VideoCodec.mjpegFrames]] walks.
    */
  def mjpegAvi(frames: Seq[Array[Byte]], microSecPerFrame: Int): Array[Byte] = {
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
      .putInt(frames.length)
      .array()
    val body = list("hdrl", Seq(chunk("avih", avih))) ++
      list("movi", frames.map(chunk("00dc", _)))
    val b = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ISO-8859-1")).putInt(4 + body.length)
      .put("AVI ".getBytes("ISO-8859-1")).put(body)
    b.array()
  }

  def videoItems(spark: SparkSession, seeds: Int = 3): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(seeds * 2L).map { i =>
      val seed = (i / 2).toInt
      val variant = (i % 2).toInt
      val frames = (0 until 4).map(p => stripeJpeg(seed, p))
      val cadence = if (variant == 1) 20000 else 40000
      MediaItem(seed * 10L + variant, mjpegAvi(frames, cadence),
        MediaMeta("video", "avi", 72, 64, frames.length.toLong * cadence / 1000))
    }
  }
}
