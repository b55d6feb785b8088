package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns with a typed metadata struct; decode / feature
  * extraction / resize / frame sampling are batched per-partition transforms.
  *
  * IMAGE decode/resize is REAL — the JDK's built-in `javax.imageio`
  * (PNG/BMP/GIF/JPEG, no external dependency) via [[ImageCodec]] — and so is
  * AUDIO for WAV/PCM via `javax.sound.sampled` ([[AudioCodec]]); undecodable
  * bytes fall back to the stub so row counts stay stable. VIDEO frame decode
  * is REAL for MJPEG AVIs (every `..dc` chunk is a JPEG) and for animated
  * GIFs ([[GifCodec]] — true INTER-FRAME reconstruction: delta rects,
  * offsets, disposal-method canvas state). Modern compressed codecs (H.26x)
  * are NOT available in this environment, so that path uses a clearly-marked
  * deterministic STUB ([[FakeCodec]]); the Spark-side contract — schema,
  * batch shape, partitioning, null handling — is real and tested either way.
  * Swapping in ffmpeg is a one-function change.
  */
object Multimodal {

  /** Typed metadata carried alongside the raw bytes. */
  final case class MediaMeta(
      kind: String,            // "image" | "audio" | "video"
      format: String,          // container/codec tag, e.g. "png", "wav"
      width: Int,              // pixels (images/video); 0 for audio
      height: Int,
      durationMs: Long)        // 0 for still images

  final case class MediaItem(id: Long, bytes: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(id: Long, kind: String, features: Array[Float])

  final case class MediaFrame(id: Long, frameIndex: Int, frameBytes: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false))), nullable = true),
  ))

  /** Real image codec on the JDK's `javax.imageio` — decode, average-pool
    * feature extraction, resize, PNG re-encode. Deterministic: pooling is a
    * fixed pixel-order walk, resize uses nearest-neighbor interpolation
    * (bilinear/area interpolation differ across JDK builds; nearest is
    * bit-stable), and PNG encoding is lossless.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage

    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      if (bytes == null || bytes.isEmpty) None
      else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))

    /** Luminance of the decoded grid average-pooled into `dim` cells in
      * raster order — a deterministic, resolution-independent feature vector
      * in [0, 1] (the slot a learned image embedding fills in a real
      * deployment).
      */
    def extractFeatures(img: BufferedImage, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      val cnt = new Array[Int](dim)
      val w = img.getWidth
      val h = img.getHeight
      val total = w.toLong * h
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          val cell = math.min(dim - 1, ((y.toLong * w + x) * dim / total).toInt)
          out(cell) += lum / 255f
          cnt(cell) += 1
          x += 1
        }
        y += 1
      }
      var d = 0
      while (d < dim) { if (cnt(d) > 0) out(d) /= cnt(d); d += 1 }
      out
    }

    def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      dst
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** 64-bit difference hash (dHash — the standard public perceptual
      * image fingerprint): nearest-neighbor resize to 9×8, integer
      * luminance, bit `y·8+x` set when `lum(x,y) > lum(x+1,y)`. Robust
      * to re-encoding and rescaling (the same content at a different
      * resolution hashes near-identically), DETERMINISTIC here because
      * the resize is the codec's bit-stable nearest-neighbor and the
      * luminance weights are integer.
      */
    def dHash(img: BufferedImage): Long = {
      val r = resize(img, 9, 8)
      def lum(x: Int, y: Int): Int = {
        val rgb = r.getRGB(x, y)
        (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
      }
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (lum(x, y) > lum(x + 1, y)) bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      bits
    }
  }

  /** Real audio codec on the JDK's `javax.sound.sampled` — WAV/PCM decode
    * and RMS-energy feature pooling, no external dependency. Compressed
    * formats (mp3 etc.) have no JDK decoder and fall back to the stub.
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    /** Decode WAV bytes to mono samples in [-1, 1] (channels averaged). */
    def decode(bytes: Array[Byte]): Option[Array[Double]] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val ok = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            (fmt.getSampleSizeInBits == 16 || fmt.getSampleSizeInBits == 8)
          if (!ok) return None
          val raw = in.readAllBytes()
          val ch = fmt.getChannels
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val frameBytes = bytesPerSample * ch
          val n = raw.length / frameBytes
          val out = new Array[Double](n)
          var f = 0
          while (f < n) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val off = f * frameBytes + c * bytesPerSample
              val v =
                if (bytesPerSample == 2) {
                  val lo = raw(off) & 0xff
                  val hi = raw(off + 1)
                  val s = if (fmt.isBigEndian) (raw(off) << 8) | (raw(off + 1) & 0xff)
                          else (hi << 8) | lo
                  s / 32768.0
                } else raw(off) / 128.0
              acc += v
              c += 1
            }
            out(f) = acc / ch
            f += 1
          }
          Some(out)
        } finally in.close()
      } catch { case _: Exception => None }
    }

    /** RMS energy of the sample stream average-pooled into `dim` windows —
      * the deterministic, duration-independent audio feature vector (the
      * slot a learned audio embedding fills in a real deployment).
      */
    def extractFeatures(samples: Array[Double], dim: Int): Array[Float] = {
      val sumSq = new Array[Double](dim)
      val cnt = new Array[Int](dim)
      val n = math.max(1, samples.length)
      var i = 0
      while (i < samples.length) {
        val cell = math.min(dim - 1, (i.toLong * dim / n).toInt)
        sumSq(cell) += samples(i) * samples(i)
        cnt(cell) += 1
        i += 1
      }
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        if (cnt(d) > 0) out(d) = math.sqrt(sumSq(d) / cnt(d)).toFloat
        d += 1
      }
      out
    }

    /** 64-bit audio difference hash — [[ImageCodec.dHash]]'s contract on
      * sound: mean-square energy pooled into 65 duration-proportional
      * windows, bit `i` set when `e(i) > e(i+1)`. Invariant to uniform
      * GAIN (both sides of every comparison scale together) and to
      * duration (windows are proportional) — a re-leveled or
      * re-containered copy of the same recording hashes identically;
      * feed the same pigeonhole pairing as the image half.
      */
    def dHash(samples: Array[Double]): Long = {
      val e = new Array[Double](65)
      val cnt = new Array[Int](65)
      val n = math.max(1, samples.length)
      var i = 0
      while (i < samples.length) {
        val cell = math.min(64, (i.toLong * 65 / n).toInt)
        e(cell) += samples(i) * samples(i)
        cnt(cell) += 1
        i += 1
      }
      var d = 0
      while (d < 65) { if (cnt(d) > 0) e(d) /= cnt(d); d += 1 }
      var bits = 0L
      var b = 0
      while (b < 64) {
        if (e(b) > e(b + 1)) bits |= 1L << b
        b += 1
      }
      bits
    }
  }

  /** Real video CONTAINER parsing — an ISO-BMFF (MP4/MOV) box walk and a
    * RIFF/AVI chunk walk, pure byte arithmetic on the public container
    * specs (ISO/IEC 14496-12; the RIFF AVI form), no dependency. Extracts
    * the `ftyp` major brand and `moov/mvhd` duration (MP4) and the `avih`
    * cadence/frame count (AVI). FRAME decode is REAL for MJPEG AVIs —
    * each `..dc` chunk is a complete JPEG the JDK decodes — and stays
    * stubbed for inter-frame codecs (H.26x needs ffmpeg; documented
    * one-function seam in [[Multimodal.sampleFrames]]).
    */
  object VideoCodec {
    final case class Mp4Meta(majorBrand: String, durationMs: Long)

    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)

    private def fourCC(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "ISO-8859-1")

    /** Walk top-level boxes; descend into `moov` for `mvhd`. */
    def parseMeta(bytes: Array[Byte]): Option[Mp4Meta] = {
      if (bytes == null || bytes.length < 16) return None
      try {
        var brand: Option[String] = None
        var duration: Option[Long] = None

        def walk(from: Int, until: Int, depth: Int): Unit = {
          var off = from
          while (off + 8 <= until) {
            val size32 = u32(bytes, off)
            val kind = fourCC(bytes, off + 4)
            val (size, hdr) =
              if (size32 == 1 && off + 16 <= until) (u64(bytes, off + 8), 16)
              else (size32, 8)
            if (size < hdr || off + size > until) return // malformed: stop
            kind match {
              case "ftyp" if size >= 12 =>
                brand = Some(fourCC(bytes, off + 8))
              case "moov" if depth == 0 =>
                walk(off + hdr, off + size.toInt, depth + 1)
              case "mvhd" =>
                val p = off + hdr
                val version = bytes(p) & 0xff
                val (timescale, dur) =
                  if (version == 1) (u32(bytes, p + 20), u64(bytes, p + 24))
                  else (u32(bytes, p + 12), u32(bytes, p + 16))
                if (timescale > 0) duration = Some(dur * 1000L / timescale)
              case _ => ()
            }
            off += size.toInt
          }
        }

        walk(0, bytes.length, 0)
        // an MP4 without ftyp is not one we claim to understand
        brand.flatMap(b => duration.map(d => Mp4Meta(b, d)))
      } catch { case _: Exception => None }
    }

    // ---- RIFF/AVI (little-endian) — the other public container layout, and
    // the one whose dominant legacy codec (MJPEG) the JDK can actually
    // decode: every `..dc` video chunk of an MJPEG AVI is a complete JPEG,
    // so frame EXTRACTION is a container walk and frame DECODE is
    // javax.imageio — real video frames with no native codec dependency.
    // Chunk layout per the public RIFF spec: fourcc + u32le size + payload,
    // WORD-aligned (odd sizes pad one byte).

    final case class AviMeta(microSecPerFrame: Long, totalFrames: Long) {
      def durationMs: Long = microSecPerFrame * totalFrames / 1000L
    }

    private def u32le(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    private def isRiffAvi(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 12 &&
        fourCC(bytes, 0) == "RIFF" && fourCC(bytes, 8) == "AVI "

    /** `avih` main header: frame cadence and count (offsets per the public
      * AVIMAINHEADER layout: dwMicroSecPerFrame at +0, dwTotalFrames at +16).
      */
    def parseAviMeta(bytes: Array[Byte]): Option[AviMeta] = {
      if (!isRiffAvi(bytes)) return None
      try {
        var meta: Option[AviMeta] = None
        def walk(from: Int, until: Int): Unit = {
          var off = from
          while (off + 8 <= until && meta.isEmpty) {
            val kind = fourCC(bytes, off)
            val size = u32le(bytes, off + 4)
            if (size < 0 || off + 8 + size > until) return
            if (kind == "LIST" && size >= 4) walk(off + 12, off + 8 + size.toInt)
            else if (kind == "avih" && size >= 20)
              meta = Some(AviMeta(u32le(bytes, off + 8), u32le(bytes, off + 8 + 16)))
            off += 8 + size.toInt + (size.toInt & 1)
          }
        }
        walk(12, bytes.length)
        // Implausible headers refuse rather than overflow: both fields are
        // attacker/corruption-controlled u32s and their product can exceed
        // Long range (2^32 × 2^32); a wrapped-negative durationMs would
        // sail through duration filters as a "valid short clip".
        meta.filter(m => m.microSecPerFrame == 0 ||
          m.totalFrames <= Long.MaxValue / math.max(1L, m.microSecPerFrame))
      } catch { case _: Exception => None }
    }

    /** All MJPEG video frames of an AVI, in stream order: payloads of the
      * `movi` list's `..dc` chunks that start with the JPEG SOI marker.
      * Empty for non-AVI bytes or non-MJPEG streams (caller falls back).
      */
    def mjpegFrames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
      if (!isRiffAvi(bytes)) return IndexedSeq.empty
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
          var off = from
          while (off + 8 <= until) {
            val kind = fourCC(bytes, off)
            val size = u32le(bytes, off + 4)
            if (size < 0 || off + 8 + size > until) return
            if (kind == "LIST" && size >= 4) {
              val listType = fourCC(bytes, off + 8)
              walk(off + 12, off + 8 + size.toInt, inMovi || listType == "movi")
            } else if (inMovi && kind.endsWith("dc") && size >= 2 &&
                (bytes(off + 8) & 0xff) == 0xff && (bytes(off + 9) & 0xff) == 0xd8) {
              out += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size.toInt)
            }
            off += 8 + size.toInt + (size.toInt & 1)
          }
        }
        walk(12, bytes.length, inMovi = false)
        out.toIndexedSeq
      } catch { case _: Exception => IndexedSeq.empty }
    }
  }

  /** Animated GIF: a REAL inter-frame format the JDK decodes natively —
    * frames arrive as deltas (partial rects at offsets) plus a disposal
    * method, and reconstruction requires canvas compositing across frames,
    * exactly the decode-state shape H.26x needs (reference pipelines ship
    * video through this stage; `services/webapp` has no video path, this is
    * the training-data tier's). Each output frame is the fully-composited
    * canvas, PNG-encoded (lossless, so probe pixels round-trip exactly).
    */
  object GifCodec {
    import java.awt.image.BufferedImage

    def isGif(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length > 6 &&
        bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

    final case class GifMeta(frameCount: Int, durationMs: Long)

    private def intAttr(n: org.w3c.dom.Node, name: String, dflt: Int): Int = {
      val attrs = n.getAttributes
      val a = if (attrs == null) null else attrs.getNamedItem(name)
      if (a == null) dflt
      else try a.getNodeValue.toInt catch { case _: NumberFormatException => dflt }
    }

    private def child(n: org.w3c.dom.Node, name: String): Option[org.w3c.dom.Node] = {
      var c = n.getFirstChild
      while (c != null) {
        if (c.getNodeName == name) return Some(c)
        c = c.getNextSibling
      }
      None
    }

    /** All composited frames, in order. Empty for non-GIF/corrupt bytes. */
    def frames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] =
      decode(bytes).map(_._1).getOrElse(IndexedSeq.empty)

    /** Frame count + duration (sum of per-frame delays; GIF delay unit is
      * 10 ms). None for non-GIF bytes.
      */
    def parseMeta(bytes: Array[Byte]): Option[GifMeta] = decode(bytes).map(_._2)

    private def decode(bytes: Array[Byte]): Option[(IndexedSeq[Array[Byte]], GifMeta)] = {
      if (!isGif(bytes)) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        // Logical screen from the first frame's bounds union (the stream
        // metadata's screen descriptor is optional in practice).
        var w = 0
        var h = 0
        val parsed = (0 until n).map { i =>
          val img = reader.read(i)
          val tree = reader.getImageMetadata(i)
            .getAsTree("javax_imageio_gif_image_1.0")
          val desc = child(tree, "ImageDescriptor")
          val x = desc.map(intAttr(_, "imageLeftPosition", 0)).getOrElse(0)
          val y = desc.map(intAttr(_, "imageTopPosition", 0)).getOrElse(0)
          val gce = child(tree, "GraphicControlExtension")
          val disposal = gce.flatMap { g =>
            val a = g.getAttributes.getNamedItem("disposalMethod")
            Option(a).map(_.getNodeValue)
          }.getOrElse("none")
          val delayMs = gce.map(intAttr(_, "delayTime", 0)).getOrElse(0) * 10L
          w = math.max(w, x + img.getWidth)
          h = math.max(h, y + img.getHeight)
          (img, x, y, disposal, delayMs)
        }
        val canvas = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
        val g = canvas.createGraphics()
        var previous: BufferedImage = null
        val out = parsed.map { case (img, x, y, disposal, _) =>
          if (disposal == "restoreToPrevious") {
            previous = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
            previous.createGraphics().drawImage(canvas, 0, 0, null)
          }
          g.drawImage(img, x, y, null)
          val snap = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(canvas, "png", snap)
          disposal match {
            case "restoreToBackgroundColor" =>
              // background is transparent on an ARGB canvas
              val cleared = g.getComposite
              g.setComposite(java.awt.AlphaComposite.Clear)
              g.fillRect(x, y, img.getWidth, img.getHeight)
              g.setComposite(cleared)
            case "restoreToPrevious" if previous != null =>
              val cleared = g.getComposite
              g.setComposite(java.awt.AlphaComposite.Src)
              g.drawImage(previous, 0, 0, null)
              g.setComposite(cleared)
            case _ => // none / doNotDispose: canvas carries forward
          }
          snap.toByteArray
        }
        g.dispose()
        Some((out, GifMeta(n, parsed.map(_._5).sum)))
      } catch { case _: Exception => None }
      finally iis.close()
    }
  }

  /** ======================== STUB CODEC ========================
    * Deterministic stand-in for real decode/resize: every "decoded" artifact
    * is derived from the bytes via seeded hashing, so tests are reproducible
    * and the pipeline shape (batch iteration, output arity, schema) is
    * exactly what a real codec integration would use. Replace the bodies
    * with actual imageio/ffmpeg calls in a real deployment.
    */
  object FakeCodec {
    /** STUB for image/audio decode → fixed-size float feature vector. */
    def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
      var d = 0
      while (d < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        // map to [-1, 1)
        out(d) = ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
        d += 1
      }
      out
    }

    /** STUB for video frame sampling: `n` evenly-spaced byte slices standing
      * in for decoded frames.
      */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty || n <= 0) Seq.empty
      else {
        val step = math.max(1, bytes.length / n)
        (0 until n).map { i =>
          val from = math.min(i * step, bytes.length - 1)
          java.util.Arrays.copyOfRange(bytes, from, math.min(from + step, bytes.length))
        }
      }
    }

    /** STUB for image resize: metadata-only transform (a real codec would
      * re-encode the pixel buffer).
      */
    def resizeMeta(meta: MediaMeta, w: Int, h: Int): MediaMeta =
      meta.copy(width = w, height = h)
  }

  /** Batched per-partition feature extraction — the Scala analogue of a
    * `mapInPandas` batch UDF: one codec context per partition, items streamed
    * through it, output one feature row per input item. Null bytes yield a
    * zero vector (kept, so row counts are stable through the pipeline).
    */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      // Codec contexts are opened once per partition in a real integration;
      // javax.imageio is stateless so images need no per-partition setup.
      it.map { m =>
        val kind = if (m.meta == null) "unknown" else m.meta.kind
        // real decode; undecodable bytes (e.g. the demo corpus's text
        // payloads, compressed codecs) fall back to the stub so row
        // counts stay stable
        val feats =
          if (m.bytes == null) new Array[Float](dim)
          else if (kind == "image")
            ImageCodec.decode(m.bytes).map(ImageCodec.extractFeatures(_, dim))
              .getOrElse(FakeCodec.extractFeatures(m.bytes, dim))
          else if (kind == "audio")
            AudioCodec.decode(m.bytes).map(AudioCodec.extractFeatures(_, dim))
              .getOrElse(FakeCodec.extractFeatures(m.bytes, dim))
          else FakeCodec.extractFeatures(m.bytes, dim)
        MediaFeatures(m.id, kind, feats)
      }
    }
  }

  /** Re-derive video metadata from the container itself: rows whose bytes
    * parse as ISO-BMFF get their REAL duration and major brand stamped into
    * the metadata struct (the pipeline's duration filters and format
    * routing then act on measured values, not ingest claims); unparseable
    * bytes keep their declared meta.
    */
  def refreshVideoMeta(items: Dataset[MediaItem]): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.map { m =>
      if (m.meta == null || m.meta.kind != "video") m
      else VideoCodec.parseMeta(m.bytes) match {
        case Some(meta) =>
          m.copy(meta = m.meta.copy(
            format = meta.majorBrand.trim, durationMs = meta.durationMs))
        case None => VideoCodec.parseAviMeta(m.bytes) match {
          case Some(avi) =>
            m.copy(meta = m.meta.copy(format = "avi", durationMs = avi.durationMs))
          case None => GifCodec.parseMeta(m.bytes) match {
            case Some(gif) =>
              m.copy(meta = m.meta.copy(format = "gif", durationMs = gif.durationMs))
            case None => m
          }
        }
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame.
    * Non-video rows pass through with zero frames (filtered out).
    *
    * REAL for MJPEG AVIs: the container walk yields every `..dc` JPEG and
    * `framesPerVideo` evenly-spaced ones (first and last always included)
    * come back as decodable JPEG bytes. Other codecs (H.26x in MP4) fall
    * back to the labeled [[FakeCodec.sampleFrames]] stub — the one-function
    * seam a real ffmpeg integration replaces.
    */
  def sampleFrames(items: Dataset[MediaItem], framesPerVideo: Int = 4): Dataset[MediaFrame] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap { m =>
      if (m.meta == null || m.meta.kind != "video" || m.bytes == null) Seq.empty[MediaFrame]
      else {
        // real decode chain: MJPEG-AVI chunks, then composited GIF frames
        val mjpeg = VideoCodec.mjpegFrames(m.bytes)
        val real = if (mjpeg.nonEmpty) mjpeg else GifCodec.frames(m.bytes)
        val frames =
          if (real.isEmpty) FakeCodec.sampleFrames(m.bytes, framesPerVideo)
          else if (real.length <= framesPerVideo) real
          else if (framesPerVideo == 1) IndexedSeq(real.head)
          else (0 until framesPerVideo).map(i =>
            real((i.toLong * (real.length - 1) / (framesPerVideo - 1)).toInt))
        frames.zipWithIndex.map { case (frame, idx) => MediaFrame(m.id, idx, frame) }
      }
    }
  }

  /** Resize: REAL for decodable images (decode → nearest-neighbor rescale →
    * lossless PNG re-encode, metadata updated to match); metadata-only stub
    * for audio/video and undecodable bytes.
    */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.map { m =>
      if (m.meta == null) m
      else if (m.meta.kind == "image") {
        ImageCodec.decode(m.bytes) match {
          case Some(img) =>
            m.copy(
              bytes = ImageCodec.encodePng(ImageCodec.resize(img, w, h)),
              meta = m.meta.copy(format = "png", width = w, height = h))
          case None => m.copy(meta = FakeCodec.resizeMeta(m.meta, w, h))
        }
      } else m.copy(meta = FakeCodec.resizeMeta(m.meta, w, h))
    }
  }

  /** Build a demo media table from any table with an id and a text column:
    * the UTF-8 bytes stand in for media payloads (the container has no real
    * media), with deterministic metadata. Exercises the full binary-column
    * path: schema, encoders, per-partition batching.
    */
  def demoMediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    val kinds = Seq("image", "audio", "video")
    df.select(col(idCol).cast(LongType).as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
        val kind = kinds((id % 3).toInt)
        MediaItem(id, bytes, MediaMeta(kind, "fake", 64, 64, if (kind == "image") 0L else 1000L))
      }
  }

  /** End-to-end demo pipeline over a text table: media-ify → features →
    * per-kind feature statistics. The aggregate output is deterministic given
    * the deterministic stub codec.
    */
  /** Integer-exact per-kind metadata statistics over the full media
    * pipeline: media-ify → frame-sample → aggregate. Every output is an
    * exact integer (counts, byte totals, pixel dimensions, durations in
    * ms, sampled-frame counts and byte totals), so unlike
    * [[featureStatsByKind]] (whose feature means are JVM-codec floats)
    * this slice hash-matches a SQL oracle exactly — the deterministic
    * contract of the plumbing is oracled, the codec floats stay spec-pinned.
    *
    * Scale shape: the frame explosion is a per-partition flatMap; its
    * aggregate shuffles once on `id` (pre-combined map-side), the final
    * rollup once on `kind` (3 groups). No driver-side iteration.
    */
  def metaStatsByKind(
      df: DataFrame, idCol: String, textCol: String,
      framesPerVideo: Int = 4): DataFrame = {
    val media = demoMediaFromText(df, idCol, textCol)
    val items = media.toDF().select(
      col("id"), col("meta.kind").as("kind"),
      length(col("bytes")).cast(LongType).as("_nbytes"),
      col("meta.width").cast(LongType).as("_w"),
      col("meta.height").cast(LongType).as("_h"),
      col("meta.durationMs").as("_dur"))
    val frameAgg = sampleFrames(media, framesPerVideo).toDF()
      .groupBy("id")
      .agg(count(lit(1)).as("_nframes"),
        sum(length(col("frameBytes")).cast(LongType)).as("_framebytes"))
    items.join(frameAgg, Seq("id"), "left")
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(col("_nbytes")).as("total_bytes"),
        sum(col("_w")).as("sum_width"),
        sum(col("_h")).as("sum_height"),
        sum(col("_dur")).as("sum_duration_ms"),
        sum(coalesce(col("_nframes"), lit(0L))).as("n_frames"),
        sum(coalesce(col("_framebytes"), lit(0L))).as("frame_bytes"))
      .orderBy("kind")
  }

  /** Perceptual fingerprints of decodable images: `(id, dhash)` — one
    * 64-bit [[ImageCodec.dHash]] per item whose bytes the JDK codec
    * decodes (non-images and undecodable bytes drop; row-stability is
    * the metadata tier's job). Per-partition decode, no shuffle.
    */
  def imageDHashes(items: Dataset[MediaItem]): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.flatMap { m =>
        ImageCodec.decode(m.bytes).map(img => (m.id, ImageCodec.dHash(img)))
      }
    }.toDF("id", "dhash")
  }

  /** Perceptual fingerprints of decodable WAV audio: `(id, dhash)` — the
    * [[AudioCodec.dHash]] energy-profile twin of [[imageDHashes]]; feed
    * [[imageNearDupPairs]] (the pairing is hash-kind-agnostic).
    */
  def audioDHashes(items: Dataset[MediaItem]): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.flatMap { m =>
        AudioCodec.decode(m.bytes).map(s => (m.id, AudioCodec.dHash(s)))
      }
    }.toDF("id", "dhash")
  }

  /** Per-frame perceptual hashes of sampled video frames:
    * `(id, frame, dhash)` for every sampled frame the JDK image codec
    * decodes (real for MJPEG AVIs and animated GIFs — the codecs this
    * repo decodes for real; H.26x stays the documented ffmpeg seam).
    */
  def videoFrameDHashes(
      items: Dataset[MediaItem], framesPerVideo: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    sampleFrames(items, framesPerVideo).mapPartitions { it =>
      it.flatMap { f =>
        ImageCodec.decode(f.frameBytes)
          .map(img => (f.id, f.frameIndex, ImageCodec.dHash(img)))
      }
    }.toDF("id", "frame", "dhash")
  }

  /** Video near-duplicate pairs: videos sharing at least
    * `minMatchingFrames` frame pairs within `maxHamming` perceptual bits
    * — re-encoded/rescaled copies of the same footage match frame by
    * frame (the shot-level generalization is a threshold knob, not a new
    * mechanism). Same pigeonhole banding as [[imageNearDupPairs]], at
    * FRAME granularity, with a per-video-pair match count on top;
    * ids+hashes only through the join, never frame bytes.
    */
  def videoNearDupPairs(
      frameHashes: DataFrame, maxHamming: Int,
      minMatchingFrames: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be 0..63, got $maxHamming")
    require(minMatchingFrames >= 1,
      s"minMatchingFrames must be >= 1, got $minMatchingFrames")
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val banded = frameHashes.select(col("id"), col("frame"), col("dhash"),
      posexplode(array((0 until chunks).map { c =>
        val lo = c * width
        val w = if (c == chunks - 1) 64 - lo else width
        shiftrightunsigned(col("dhash"), lo)
          .bitwiseAND(lit(if (w == 64) -1L else (1L << w) - 1L))
      }: _*)))
      .toDF("id", "frame", "dhash", "band", "chunk")
    val l = banded.select(col("band"), col("chunk"), col("id").as("id_a"),
      col("frame").as("f_a"), col("dhash").as("h_a"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("id_b"),
      col("frame").as("f_b"), col("dhash").as("h_b"))
    l.join(r, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "f_a", "f_b", "h_a", "h_b").distinct()
      .where(bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= maxHamming)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("matching_frames"))
      .where(col("matching_frames") >= minMatchingFrames)
  }

  /** Image near-duplicate pairs by perceptual hash: pairs of ids whose
    * dHashes differ in at most `maxHamming` of 64 bits — re-encoded,
    * rescaled, or lightly-edited copies of the same picture (the image
    * half of the dedup tier; text near-dup is MinHash/SimHash upstream).
    *
    * The pairing is the SimHash pigeonhole: split the 64 bits into
    * `maxHamming + 1` chunks — any pair within the budget agrees on at
    * least one whole chunk — band-join on (chunk index, chunk value),
    * dedup candidates, verify with one `bit_count(xor)`. Candidate
    * volume is Σ per-bucket² over hash-chunk buckets, never |images|²;
    * ids-only through the join.
    */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be 0..63, got $maxHamming")
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val banded = hashes.select(col("id"), col("dhash"),
      posexplode(array((0 until chunks).map { c =>
        // chunk c: bits [c*width, ...) — the last chunk takes the remainder
        val lo = c * width
        val w = if (c == chunks - 1) 64 - lo else width
        shiftrightunsigned(col("dhash"), lo)
          .bitwiseAND(lit(if (w == 64) -1L else (1L << w) - 1L))
      }: _*)))
      .toDF("id", "dhash", "band", "chunk")
    val l = banded.select(col("band"), col("chunk"),
      col("id").as("id_a"), col("dhash").as("h_a"))
    val r = banded.select(col("band"), col("chunk"),
      col("id").as("id_b"), col("dhash").as("h_b"))
    l.join(r, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  def featureStatsByKind(df: DataFrame, idCol: String, textCol: String, dim: Int = 16): DataFrame = {
    val feats = extractFeatures(demoMediaFromText(df, idCol, textCol), dim)
    feats.toDF()
      // native kernel, not the aggregate() HOF (which walks interpreted
      // per element — the pitfall the expr layer exists to avoid)
      .select(col("kind"), graft.expr.VectorMath.sum(col("features")).as("_fsum"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), round(avg(col("_fsum")), 4).as("mean_feature_sum"))
      .orderBy("kind")
  }
}
