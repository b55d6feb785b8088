package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Concat-and-chunk packing: a fully hand-computed single-bucket trace,
  * the exact-fill and partition invariants, multi-bucket independence, and
  * the one-exchange plan shape.
  */
class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  // (id, token_count) — cumulative starts in one bucket: 0,3,7,9,14,15.
  private val docs = Seq(
    (1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L), (5L, 1L), (6L, 6L)
  ).toDF("doc_id", "tok")

  private def packed(buckets: Int, L: Int = 5) =
    Packing.packConcatChunk(docs, "doc_id", col("tok"), seqLen = L, numBuckets = buckets)

  test("single-bucket hand trace: boundaries split docs, offsets exact") {
    val got = packed(1).orderBy("seq", "doc_id")
      .select("seq", "doc_id", "slice_begin", "slice_len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = Seq(
      (0L, 1L, 0L, 3L),
      (0L, 2L, 0L, 2L), // doc 2 spans the seq-0/1 boundary
      (1L, 2L, 2L, 2L),
      (1L, 3L, 0L, 2L),
      (1L, 4L, 0L, 1L), // doc 4 spans the seq-1/2 boundary
      (2L, 4L, 1L, 4L),
      (2L, 5L, 0L, 1L),
      (3L, 6L, 0L, 5L), // doc 6 alone fills seq 3 and spills into 4
      (4L, 6L, 5L, 1L))
    assert(got == want)
  }

  test("every sequence except each bucket's last holds exactly seqLen tokens") {
    for (buckets <- Seq(1, 2, 3)) {
      val fill = Packing.sequenceFill(packed(buckets))
        .orderBy("bucket", "seq")
        .as[(Long, Long, Long)].collect().toSeq
      fill.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        assert(sorted.map(_._2) == sorted.indices.map(_.toLong), s"gap in seq ids: $sorted")
        sorted.dropRight(1).foreach { case (b, q, tokens) =>
          assert(tokens == 5L, s"bucket $b seq $q underfull: $tokens")
        }
        assert(sorted.last._3 <= 5L)
      }
    }
  }

  test("per-doc slices partition [0, tok) in order") {
    for (buckets <- Seq(1, 2, 3)) {
      val byDoc = packed(buckets)
        .orderBy("doc_id", "seq")
        .select("doc_id", "slice_begin", "slice_len")
        .as[(Long, Long, Long)].collect().toSeq.groupBy(_._1)
      val toks = docs.as[(Long, Long)].collect().toMap
      byDoc.foreach { case (id, slices) =>
        var off = 0L
        slices.foreach { case (_, begin, len) =>
          assert(begin == off, s"doc $id slice gap at $off")
          assert(len > 0)
          off += len
        }
        assert(off == toks(id), s"doc $id slices cover $off of ${toks(id)}")
      }
    }
  }

  test("buckets pack independently and never share sequences") {
    val got = packed(2).select("bucket", "doc_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got.forall { case (b, id) => id % 2 == b })
  }

  test("zero-token documents are dropped") {
    val withEmpty = docs.union(Seq((7L, 0L)).toDF("doc_id", "tok"))
    val got = Packing.packConcatChunk(withEmpty, "doc_id", col("tok"), 5, 1)
    assert(!got.select("doc_id").as[Long].collect().contains(7L))
  }

  test("materializeSequences emits exact token streams in id order") {
    val texts = Seq(
      (1L, "a b c"),
      (2L, "d e f g"),
      (3L, "h i")
    ).toDF("doc_id", "text")
    val got = Packing.materializeSequences(texts, "doc_id", "text", seqLen = 5, numBuckets = 1)
      .orderBy("seq")
      .select("seq", "seq_text", "n_tokens")
      .as[(Long, String, Long)].collect().toSeq
    // stream: a b c | d e f g | h i → seqs of 5: "a b c d e", "f g h i"
    assert(got == Seq((0L, "a b c d e", 5L), (1L, "f g h i", 4L)))
  }

  test("materializeSequences: every non-final sequence is exactly seqLen words") {
    val many = (1L to 40L).map(i => (i, (1L to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.materializeSequences(many, "doc_id", "text", seqLen = 7, numBuckets = 3)
      .select("bucket", "seq", "seq_text")
      .as[(Long, Long, String)].collect().toSeq
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(_._2).dropRight(1).foreach { case (b, q, text) =>
        assert(text.split(" ").length == 7, s"bucket $b seq $q: '$text'")
      }
    }
  }

  test("materializeSequences plan keeps the single bucket exchange") {
    val texts = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val plan = Packing.materializeSequences(texts, "doc_id", "text", 5, 2)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }

  test("plan: one hash exchange on the bucket key, nothing else") {
    val plan = packed(4).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_bucket"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }

  test("shardAssignments: total partition, dense in-shard ranks, deterministic") {
    val docs = (1L to 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val a = Packing.shardAssignments(docs, "doc_id", 4)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a.map(_._1).toSet == (1L to 100L).toSet) // every doc, exactly once
    assert(a.map(_._2).toSet.subsetOf((0L until 4L).toSet))
    // per shard: positions are 0..n-1 dense
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == rows.indices.map(_.toLong))
    }
    // deterministic: same assignment on re-run
    val b = Packing.shardAssignments(docs, "doc_id", 4)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a.toSet == b.toSet)
  }

  test("publishShards: shard dirs round-trip the corpus in shard order") {
    val docs = (1L to 50L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/shards"
    Packing.publishShards(docs, "doc_id", 4, path)
    val back = spark.read.parquet(path)
    assert(back.select("doc_id").as[Long].collect().toSet == (1L to 50L).toSet)
    // each shard dir holds exactly its assignment, readable in pos order
    val assigned = Packing.shardAssignments(docs, "doc_id", 4)
      .select("doc_id", "shard").as[(Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    for (s <- assigned.keys) {
      val rows = spark.read.parquet(s"$path/shard=$s")
        .select("doc_id", "pos").as[(Long, Long)].collect().toSeq
      assert(rows.map(_._1).toSet == assigned(s))
      assert(rows.map(_._2).sorted == rows.indices.map(_.toLong))
    }
  }

  test("lengthGroupedBins: homogeneous bins at capacity, over-long docs excluded") {
    // 9 docs of 3 tokens (k = 10/3 = 3 per bin), 4 docs of 5 tokens
    // (k = 2), one 11-token doc excluded at seqLen 10
    val docs = ((1L to 9L).map(i => (i, ("w " * 3).trim)) ++
      (11L to 14L).map(i => (i, ("w " * 5).trim)) :+
      (99L, ("w " * 11).trim)).toDF("doc_id", "text")
    val out = Packing.lengthGroupedBins(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), seqLen = 10, numBuckets = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(!out.exists(_._1 == 99L), "over-long docs must be excluded")
    // per length: bins fill to capacity, slots are exactly 0..k-1 per bin
    for ((l, k) <- Seq(3L -> 3, 5L -> 2)) {
      val group = out.filter(_._2 == l)
      val byBin = group.groupBy(_._3).view.mapValues(_.map(_._4).sorted).toMap
      val full = byBin.filterKeys(_ < byBin.keys.max)
      assert(full.values.forall(_ == (0L until k.toLong)), s"L=$l full bins")
      assert(byBin(byBin.keys.max).size <= k)
    }
    // the bucketed two-phase rank equals ONE global per-length window
    val global = {
      import org.apache.spark.sql.expressions.Window
      docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
          Sampling.hashUnit(col("doc_id"), 42).as("u"))
        .where(col("n_tok").between(1, 10))
        .withColumn("rk", row_number().over(
          Window.partitionBy("n_tok").orderBy("u", "doc_id")) - 1)
        .select(col("doc_id"), col("n_tok"),
          expr("rk div (10L div n_tok)").as("bin"),
          expr("rk % (10L div n_tok)").as("slot"))
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    }
    assert(out.sortBy(_._1) === global)
    // and it is invariant to the bucket count
    val other = Packing.lengthGroupedBins(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), seqLen = 10, numBuckets = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(other === global)
  }

  private val fimDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "abcdefghij"),
    (3L, ""),
    (4L, "pack my box with five dozen liquor jugs"),
    (5L, "sphinx of black quartz judge my vow"),
  ).toDF("doc_id", "text")

  test("FIM: reassembly invariant — strip sentinels, reorder, recover the text") {
    val out = Packing.fimExamples(fimDocs, "doc_id", "text", fimRate = 1.0)
      .as[(Long, Boolean, String)].collect()
    val orig = fimDocs.as[(Long, String)].collect().toMap
    assert(out.forall(_._2), "rate 1.0 must transform every doc")
    for ((id, _, t) <- out) {
      assert(t.startsWith("<PRE>"), s"doc $id: $t")
      val body = t.stripPrefix("<PRE>")
      val Array(prefix, rest) = body.split("<SUF>", 2)
      val Array(suffix, middle) = rest.split("<MID>", 2)
      assert(prefix + middle + suffix === orig(id),
        s"doc $id reassembly failed: <$prefix|$middle|$suffix> vs <${orig(id)}>")
    }
  }

  test("FIM: rate 0 passes through verbatim; the gate is the seeded unit hash") {
    val out = Packing.fimExamples(fimDocs, "doc_id", "text", fimRate = 0.0)
      .as[(Long, Boolean, String)].collect()
    val orig = fimDocs.as[(Long, String)].collect().toMap
    assert(out.forall(!_._2))
    assert(out.forall { case (id, _, t) => t === orig(id) })
    // a mid-rate transforms a strict, deterministic subset
    val half = Packing.fimExamples(fimDocs, "doc_id", "text", fimRate = 0.5)
      .as[(Long, Boolean, String)].collect().toSeq
    val again = Packing.fimExamples(fimDocs, "doc_id", "text", fimRate = 0.5)
      .as[(Long, Boolean, String)].collect().toSeq
    assert(half.sortBy(_._1) === again.sortBy(_._1), "must be deterministic")
    intercept[IllegalArgumentException](
      Packing.fimExamples(fimDocs, "doc_id", "text", fimRate = 1.5))
  }

  test("FIM: empty text survives (all spans empty, sentinels only)") {
    val out = Packing.fimExamples(fimDocs.where(col("doc_id") === 3L),
        "doc_id", "text", fimRate = 1.0)
      .as[(Long, Boolean, String)].collect().head
    assert(out._3 === "<PRE><SUF><MID>")
  }

  test("span corruption: sentinel structure, non-overlap, reassembly invariant") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, (1 to (4 + (i % 17)).toInt).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val texts = docs.as[(Long, String)].collect().toMap
    val out = Packing.spanCorruptionExamples(docs, "doc_id", "text",
        numSpans = 2, spanLen = 3)
      .as[(Long, Boolean, String, String)].collect()
    assert(out.exists(_._2) && out.exists(!_._2), "fixture must exercise both gates")
    out.foreach { case (id, corrupted, inputs, targets) =>
      val text = texts(id)
      if (!corrupted) {
        assert(inputs === text && targets === "")
      } else {
        // structure: exactly one of each sentinel, in order
        for (i <- 0 to 1)
          assert(inputs.split(" ").count(_ == s"<extra_id_$i>") === 1, inputs)
        assert(targets.startsWith("<extra_id_0> ") &&
          targets.endsWith(" <extra_id_2>"), targets)
        // reassembly: splice each target span over its sentinel → original
        val spans = targets.split("<extra_id_\\d>").map(_.trim).filter(_.nonEmpty)
        assert(spans.length === 2, targets)
        assert(spans.forall(_.split(" ").length === 3), targets) // spanLen
        val rebuilt = inputs
          .replace("<extra_id_0>", spans(0))
          .replace("<extra_id_1>", spans(1))
          .replaceAll(" +", " ").trim
        assert(rebuilt === text, s"doc $id: reassembly broke\n$inputs\n$targets")
      }
    }
    intercept[IllegalArgumentException](
      Packing.spanCorruptionExamples(docs, "doc_id", "text", numSpans = 0))
    intercept[IllegalArgumentException](
      Packing.spanCorruptionExamples(docs, "doc_id", "text", spanLen = 0))
  }
}
