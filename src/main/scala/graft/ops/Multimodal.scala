package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns with a typed metadata struct; decode / feature
  * extraction / resize / frame sampling are batched per-partition transforms.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB ([[FakeCodec]]); the
  * Spark-side contract — schema, batch shape, partitioning, null handling —
  * is real and tested. Swapping in a real codec is a one-function change.
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
      // Real integration: open the codec/session once per partition here.
      it.map { m =>
        val feats =
          if (m.bytes == null) new Array[Float](dim)
          else FakeCodec.extractFeatures(m.bytes, dim)
        MediaFeatures(m.id, if (m.meta == null) "unknown" else m.meta.kind, feats)
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame.
    * Non-video rows pass through with zero frames (filtered out).
    */
  def sampleFrames(items: Dataset[MediaItem], framesPerVideo: Int = 4): Dataset[MediaFrame] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap { m =>
      if (m.meta == null || m.meta.kind != "video" || m.bytes == null) Seq.empty[MediaFrame]
      else FakeCodec.sampleFrames(m.bytes, framesPerVideo).zipWithIndex.map {
        case (frame, idx) => MediaFrame(m.id, idx, frame)
      }
    }
  }

  /** Resize (stub): typed metadata transform, bytes passed through. */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.map(m => if (m.meta == null) m else m.copy(meta = FakeCodec.resizeMeta(m.meta, w, h)))
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
  def featureStatsByKind(df: DataFrame, idCol: String, textCol: String, dim: Int = 16): DataFrame = {
    val feats = extractFeatures(demoMediaFromText(df, idCol, textCol), dim)
    feats.toDF()
      .select(col("kind"), aggregate(col("features").cast("array<double>"), lit(0.0), _ + _).as("_fsum"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), round(avg(col("_fsum")), 4).as("mean_feature_sum"))
      .orderBy("kind")
  }
}
