package graft.ops

import graft.SparkSpecBase
import graft.ops.Multimodal._

/** Multimodal plumbing: binary columns + typed metadata through per-partition
  * batch transforms (stub codec — the Spark-side contract is what's tested).
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
}
