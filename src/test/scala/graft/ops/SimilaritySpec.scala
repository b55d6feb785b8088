package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN operators: brute-force exactness, LSH bucketing recall, pair dedup. */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  /** Four clustered vectors + one orthogonal outlier (dim 4). */
  private def vecs: DataFrame = Seq(
    (0L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, 0.12f, 0.0f, 0.0f)),   // near 0
    (2L, Seq(0.9f, 0.08f, 0.05f, 0.0f)),  // near 0
    (3L, Seq(0.0f, 0.0f, 1.0f, 0.1f)),    // different direction
    (4L, Seq(0.0f, 0.0f, 0.0f, 1.0f)),    // orthogonal-ish
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine desc with id tiebreak, excluding self") {
    val q = vecs.where(col("vec_id") === 0)
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, "vec_id", "embedding", k = 2)
      .orderBy("query_id", "rank")
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSeq
    assert(out === Seq((0L, 1, 1L), (0L, 2, 2L)))
  }

  test("bruteForcePairs lists exactly the pairs at or above threshold") {
    val out = Similarity.bruteForcePairs(vecs, "vec_id", "embedding", threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("lshTopK finds the same top neighbors as brute force for clustered vectors") {
    val q = vecs.where(col("vec_id") === 0)
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, "vec_id", "embedding", 2)
      .select("neighbor_id").as[Long].collect().toSet
    val lsh = Similarity.lshTopK(vecs, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 2, dim = 4, numPlanes = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(lsh === brute)
  }

  test("embeddingNearDupPairs emits each qualifying pair once despite multi-probe") {
    val out = Similarity.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.99, dim = 4, numPlanes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(out.distinct === out)
    assert(out.toSet.subsetOf(Set((0L, 1L), (0L, 2L), (1L, 2L))))
    assert(out.contains((0L, 1L))) // the tightest pair survives bucketing
  }

  test("ivfTopK recovers brute-force neighbors for clustered vectors") {
    val q = vecs.where(col("vec_id") === 0)
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, "vec_id", "embedding", 2)
      .select("neighbor_id").as[Long].collect().toSet
    // nlist=2 cells, probe both → exhaustive within cells; cluster {0,1,2}
    // shares a cell so the true neighbors are found
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 2, nlist = 2, nprobe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ivf === brute)
  }

  test("ivfTopK is deterministic across runs and partitioning") {
    val q = vecs.where(col("vec_id") < 2)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
        k = 3, nlist = 2, nprobe = 1)
        .orderBy("query_id", "rank")
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSeq
    assert(run(vecs) === run(vecs.repartition(7)))
  }

  test("kmeans-refined IVF still recovers brute-force neighbors") {
    val q = vecs.where(col("vec_id") === 0)
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, "vec_id", "embedding", 2)
      .select("neighbor_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 2, nlist = 2, nprobe = 2, refineIters = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ivf === brute)
  }

  test("trainCap bounds the k-means training set deterministically") {
    // 200 synthetic vectors on a ring; cap 40 → the training sample is a
    // hash-threshold subset of ~42 rows, the same rows at any partitioning.
    val big = spark.range(200).select(col("id").as("vec_id"),
      array(cos(col("id") * 0.1), sin(col("id") * 0.1),
        lit(0.0), lit(0.0)).as("embedding"))
    val sampled = Similarity.trainingFrame(
      big.select(col("vec_id").as("_id"), col("embedding").as("_v")),
      "_id", cap = 40, seed = 42, materialize = false)
    val n = sampled.count()
    assert(n < 200 && n > 10, s"sample size $n should be near 42")
    assert(sampled.select("_id").as[Long].collect().toSet ===
      Similarity.trainingFrame(
        big.repartition(13).select(col("vec_id").as("_id"), col("embedding").as("_v")),
        "_id", cap = 40, seed = 42, materialize = false)
        .select("_id").as[Long].collect().toSet)
    // cap >= n → identity (full-corpus training unchanged)
    assert(Similarity.trainingFrame(
      big.select(col("vec_id").as("_id")), "_id", cap = 500, seed = 42,
      materialize = false).count() === 200)
  }

  test("trainCap leaves init-only (iters=0) centroids unchanged, and refined centroids reproduce") {
    val big = spark.range(200).select(col("id").as("vec_id"),
      array(cos(col("id") * 0.1), sin(col("id") * 0.1),
        lit(0.0), lit(0.0)).as("embedding"))
    // Superset property: the threshold sample holds every k-smallest-hash
    // row, so the init pick — and therefore iters=0 centroids — are
    // cap-invariant.
    val full0 = Similarity.kmeansCentroids(big, "vec_id", "embedding", k = 4, iters = 0)
    val cap0 = Similarity.kmeansCentroids(big, "vec_id", "embedding", k = 4, iters = 0,
      trainCap = 40)
    assert(full0.map(_.toSeq) === cap0.map(_.toSeq))
    // Capped refinement is deterministic run to run and across partitioning.
    val capR = Similarity.kmeansCentroids(big, "vec_id", "embedding", k = 4, iters = 2,
      trainCap = 40)
    val capR2 = Similarity.kmeansCentroids(big.repartition(13), "vec_id", "embedding",
      k = 4, iters = 2, trainCap = 40)
    assert(capR.map(_.toSeq) === capR2.map(_.toSeq))
    // ... and a capped refined index still serves a full valid ranking.
    val q = big.where(col("vec_id") < 2)
    val out = Similarity.ivfTopK(big, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 2, refineIters = 2, trainCap = 40)
    assert(out.count() === 6)
  }

  test("ivfRadius: nprobe-monotone recall, always a subset of brute, exact at nprobe=nlist") {
    // 120 ring vectors in dim 8 (angle = id·0.0523 ≈ full circle): the
    // 0.9-cosine radius is an angular band (±~8 ids; margin at the cut
    // ~1.4e-2 — cos(8Δ)=0.914, cos(9Δ)=0.891), and the IVF cells are arcs
    // of the ring, so nprobe genuinely gates which band segments are seen.
    val big = spark.range(120).select(col("id").as("vec_id"),
      array(cos(col("id") * 0.0523), sin(col("id") * 0.0523),
        lit(0.0), lit(0.0), lit(0.0), lit(0.0), lit(0.0), lit(0.0))
        .as("embedding"))
    val q = big.where(col("vec_id") % 30 === 0) // 4 queries spread around
    val brute = Similarity.bruteForceRadius(big, "vec_id", "embedding",
        q, "vec_id", "embedding", minCosine = 0.9)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val cents = Similarity.kmeansCentroids(big, "vec_id", "embedding",
      k = 8, iters = 0)
    val index = Similarity.assignCells(big, "vec_id", "embedding", cents)
    def hits(np: Int): Set[(Long, Long)] =
      Similarity.ivfRadius(index, cents, q, "vec_id", "embedding",
          minCosine = 0.9, nprobe = np)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val h = Seq(1, 2, 4, 8).map(hits)
    // the threshold predicate is identical — every probed result is a
    // subset of the exact answer, and probing more cells only adds
    assert(h.forall(_.subsetOf(brute)))
    assert(h.sliding(2).forall { case Seq(a, b) => a.subsetOf(b) })
    // exhaustive probing IS the exact radius search
    assert(brute.nonEmpty && h.last === brute)
  }

  test("matryoshkaRecallReport: identity at full dim, degraded head-only rung, exact shares") {
    // ring in dims 1-2 of a 4-dim vector: the 2-dim prefix carries the
    // whole geometry (recall 1.0 like full), the 1-dim prefix collapses
    // the ring to cos(angle) and genuinely degrades
    val big = spark.range(60).select(col("id").as("vec_id"),
      array(cos(col("id") * 0.105), sin(col("id") * 0.105),
        lit(0.0), lit(0.0)).as("embedding"))
    val q = big.where(col("vec_id") < 3)
    val got = Similarity.matryoshkaRecallReport(big, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, dims = Seq(1, 2, 4))
      .as[(Int, Double)].collect().toMap
    assert(got(4) === 1.0) // full prefix IS the full ranking
    assert(got(2) === 1.0) // the ring lives in dims 1-2
    assert(got(1) < 1.0 && got(1) >= 0.0) // cos-only collapses neighbors
    // every rung is an exact integer share of nq·k = 15
    assert(got.values.forall(r => (r * 15).round.toDouble === r * 15))
    intercept[IllegalArgumentException](
      Similarity.matryoshkaRecallReport(big, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, dims = Nil))
    // a corpus SHORTER than k (3 non-self neighbors per query against
    // k = 5): the denominator is the full ranking's ACTUAL size, so the
    // identity rung still reads exactly 1.0 — an nq·k denominator would
    // bias every rung to ≤ 0.6 (the round-16 advice)
    val tiny = big.where(col("vec_id") < 4)
    val short = Similarity.matryoshkaRecallReport(tiny, "vec_id", "embedding",
        tiny, "vec_id", "embedding", k = 5, dims = Seq(2, 4))
      .as[(Int, Double)].collect().toMap
    assert(short(4) === 1.0, s"identity rung biased low: $short")
    assert(short(2) === 1.0)
  }

  test("lshTopK recall vs brute force is monotone in probeBits, exhaustive at numPlanes") {
    // 60 ring vectors in dim 8 — enough bucket diversity that probeBits
    // actually changes the candidate set.
    val big = spark.range(60).select(col("id").as("vec_id"),
      array(cos(col("id") * 0.4), sin(col("id") * 0.4),
        cos(col("id") * 0.7), sin(col("id") * 0.7),
        lit(0.1), lit(0.2), lit(0.3), lit(0.4)).as("embedding"))
    val q = big.where(col("vec_id") < 6)
    val brute = Similarity.bruteForceTopK(big, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(pb: Int): Double = {
      val got = Similarity.lshTopK(big, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 3, dim = 8, numPlanes = 5, probeBits = pb)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    val rs = Seq(0, 1, 2, 3, 5).map(recall)
    assert(rs.sliding(2).forall(p => p(0) <= p(1)),
      s"recall must be monotone in probeBits: $rs")
    // probeBits = numPlanes visits every bucket → brute-force equal
    assert(rs.last === 1.0)
  }

  test("trainCap init-invariance holds across seeds and caps") {
    val big = spark.range(150).select(col("id").as("vec_id"),
      array(cos(col("id") * 0.3), sin(col("id") * 0.3),
        cos(col("id") * 0.9), sin(col("id") * 0.9)).as("embedding"))
    for (seed <- Seq(1, 7, 42); cap <- Seq(50, 120)) {
      val full = Similarity.kmeansCentroids(big, "vec_id", "embedding",
        k = 5, iters = 0, seed = seed)
      val capped = Similarity.kmeansCentroids(big, "vec_id", "embedding",
        k = 5, iters = 0, seed = seed, trainCap = cap)
      assert(full.map(_.toSeq) === capped.map(_.toSeq), s"seed=$seed cap=$cap")
    }
  }

  test("AutoTrainCap default resolves to 256·k, binds, and stays cap-invariant") {
    // 600 vectors, k=2 → the AUTO default (256·2 = 512) actually BINDS —
    // the production-shaped caller that passes nothing must train bounded.
    val big = spark.range(600).select(col("id").as("vec_id"),
      array(cos(col("id") * 0.05), sin(col("id") * 0.05),
        lit(0.0), lit(0.0)).as("embedding"))
    // (a) the default IS 256·k: default-arg refined centroids equal an
    // explicit trainCap = 512, and differ from nothing — same construction.
    val auto = Similarity.kmeansCentroids(big, "vec_id", "embedding", k = 2, iters = 1)
    val explicit512 = Similarity.kmeansCentroids(big, "vec_id", "embedding",
      k = 2, iters = 1, trainCap = 512)
    assert(auto.map(_.toSeq) === explicit512.map(_.toSeq))
    // (b) init (iters = 0) is cap-invariant even while the auto cap binds:
    // default == explicitly-unbounded (trainCap = 0) full-corpus training.
    val auto0 = Similarity.kmeansCentroids(big, "vec_id", "embedding", k = 2, iters = 0)
    val full0 = Similarity.kmeansCentroids(big, "vec_id", "embedding",
      k = 2, iters = 0, trainCap = 0)
    assert(auto0.map(_.toSeq) === full0.map(_.toSeq))
    // (c) the bounded default is deterministic across partitionings.
    val auto2 = Similarity.kmeansCentroids(big.repartition(13), "vec_id", "embedding",
      k = 2, iters = 1)
    assert(auto.map(_.toSeq) === auto2.map(_.toSeq))
  }

  test("randomProject: deterministic ±1 planes, linear, and rank-preserving on clustered vectors") {
    val planes = Similarity.rademacherPlanes(4, 3)
    assert(planes.length === 3 && planes.forall(_.length === 4))
    assert(planes.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(planes.map(_.toSeq) ===
      Similarity.rademacherPlanes(4, 3).map(_.toSeq)) // spec-fixed PRNG
    // projection is linear: P(2v) = 2·P(v) exactly (±1 weights, exact doubling)
    val df = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0)), (2L, Seq(2.0, 4.0, 6.0, 8.0)))
      .toDF("vec_id", "embedding")
    val p = Similarity.randomProject(df, "vec_id", "embedding", outDim = 3, dim = 4)
      .as[(Long, Seq[Double])].collect().toMap
    assert(p(2L) === p(1L).map(_ * 2.0))
    // recall vs full-dim exact ranking on a clustered corpus: 64→16 dims
    val big = spark.range(120).select(col("id").as("vec_id"),
      array((0 until 64).map(d =>
        cos(col("id") * 0.15 + lit(d * 0.4)) + (col("id") % 3).cast("double") * 2.0
      ): _*).as("embedding"))
    val q = big.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(big, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val proj = Similarity.randomProject(big, "vec_id", "embedding", outDim = 16, dim = 64)
    val approx = Similarity.bruteForceTopK(proj, "vec_id", "vec",
        proj.where(col("vec_id") < 5), "vec_id", "vec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"JL 64→16 recall@5 too low: $recall")
  }

  test("sq8: codes bounded 0..255, extremes exact, midpoint dequant within half a cell, degenerate dims code 0") {
    val df = Seq(
      (1L, Seq(0.0, 5.0, 7.0)),
      (2L, Seq(10.0, 5.0, -3.0)),
      (3L, Seq(5.0, 5.0, 2.0))).toDF("vec_id", "embedding")
    val (mn, mx) = Similarity.sqBounds(df, "embedding", 3)
    assert(mn.toSeq === Seq(0.0, 5.0, -3.0) && mx.toSeq === Seq(10.0, 5.0, 7.0))
    val codes = Similarity.sq8Codes(df, "vec_id", "embedding", mn, mx)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.flatten.forall(c => c >= 0 && c <= 255))
    assert(codes(1L)(0) === 0 && codes(2L)(0) === 255) // extremes hit the rails
    assert(codes.values.forall(_(1) === 0)) // degenerate dim (mn = mx) codes 0
    // dequant lands within half a quantization cell of the original
    val dq = Similarity.sq8Codes(df, "vec_id", "embedding", mn, mx)
      .select(col("vec_id"), Similarity.sq8Dequant(col("codes"), mn, mx).as("dq"))
      .as[(Long, Seq[Double])].collect().toMap
    val orig = df.as[(Long, Seq[Double])].collect().toMap
    for ((id, v) <- orig; j <- v.indices if mx(j) > mn(j)) {
      val cell = (mx(j) - mn(j)) / 256.0
      assert(math.abs(dq(id)(j) - v(j)) <= cell / 2 + 1e-12,
        s"vec $id dim $j: ${dq(id)(j)} vs ${v(j)}")
    }
    // ADC ranking recovers the exact top-k on well-separated vectors
    val big = spark.range(80).select(col("id").as("vec_id"),
      array((0 until 8).map(d =>
        cos(col("id") * 0.3 + lit(d * 0.7)) * 5.0): _*).as("embedding"))
    val exact = Similarity.bruteForceTopK(big, "vec_id", "embedding",
        big.where(col("vec_id") < 4), "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adc = Similarity.sq8TopK(big, "vec_id", "embedding",
        big.where(col("vec_id") < 4), "vec_id", "embedding", k = 5, dim = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = adc.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ8 ADC recall@5 too low: $recall")
  }

  test("hardNegatives: positive above the bar, negatives in the band, easy ones dropped") {
    val corpus = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0)),   // anchor
      (101L, Seq(1.0, 0.05, 0.0, 0.0)),  // near-dup → the positive
      (102L, Seq(1.0, 1.0, 0.0, 0.0)),   // cos ≈ .707 → hard negative 1
      (103L, Seq(1.0, 2.0, 0.0, 0.0)),   // cos ≈ .447 → hard negative 2
      (104L, Seq(0.0, 0.0, 1.0, 0.0)),   // cos 0 → easy, dropped by the floor
      (200L, Seq(0.0, 0.0, 0.0, 1.0)),   // isolated anchor: nothing emitted
    ).toDF("vec_id", "embedding")
    val anchors = corpus.where(col("vec_id") === 100L || col("vec_id") === 200L)
    val out = Similarity.hardNegatives(corpus, "vec_id", "embedding",
        anchors, "vec_id", "embedding",
        negK = 2, posThreshold = 0.9, negFloor = 0.3)
      .select("anchor_id", "role", "rank", "neighbor_id")
      .as[(Long, String, Int, Long)].collect().toSet
    assert(out === Set(
      (100L, "positive", 1, 101L),
      (100L, "hard_negative", 1, 102L),
      (100L, "hard_negative", 2, 103L)))
    intercept[IllegalArgumentException](
      Similarity.hardNegatives(corpus, "vec_id", "embedding", anchors,
        "vec_id", "embedding", negK = 0, posThreshold = 0.9))
    intercept[IllegalArgumentException](
      Similarity.hardNegatives(corpus, "vec_id", "embedding", anchors,
        "vec_id", "embedding", negK = 1, posThreshold = 0.2, negFloor = 0.3))
  }

  test("vecAvg aggregates element-wise means per group, ignoring nulls") {
    val df = Seq(
      ("a", Some(Seq(1.0, 2.0))), ("a", Some(Seq(3.0, 4.0))), ("a", None),
      ("b", Some(Seq(10.0, 20.0))),
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(graft.expr.VectorAvg.vecAvg(col("v")).as("m"))
      .orderBy("g").as[(String, Seq[Double])].collect().toSeq
    assert(out === Seq(("a", Seq(2.0, 3.0)), ("b", Seq(10.0, 20.0))))
    // all-null group yields null
    val nulls = Seq(("c", Option.empty[Seq[Double]])).toDF("g", "v")
      .groupBy("g").agg(graft.expr.VectorAvg.vecAvg(col("v")).as("m"))
    assert(nulls.collect().head.isNullAt(1))
  }

  /** Clustered corpus for the recall check: 12 cluster centers (dim 16),
    * 5 seeded perturbations each — near-dup pairs exist within clusters,
    * none across. Deterministic (seeded PRNG).
    */
  private def clusteredVecs: DataFrame = {
    val rnd = new java.util.Random(7L)
    val centers = Seq.fill(12)(Array.fill(16)(rnd.nextGaussian()))
    val rows = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 5).map { j =>
        val v = c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq
        ((ci * 5 + j).toLong, v)
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cellStratifiedSample keeps an equal per-cell budget, deterministically") {
    val corpus = clusteredVecs
    val kept = Similarity.cellStratifiedSample(corpus, "vec_id", "embedding",
      nlist = 6, perCell = 3)
    val byCell = kept.groupBy("cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCell.values.forall(_ <= 3L), s"cell over budget: $byCell")
    assert(byCell.values.sum === kept.count())
    // coverage: every cell that has members keeps at least one
    assert(byCell.values.forall(_ >= 1L))
    // deterministic under partitioning
    val again = Similarity.cellStratifiedSample(corpus.repartition(7), "vec_id", "embedding",
      nlist = 6, perCell = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === kept.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("embeddingNearDupPairs (LSH) pairs are a subset of brute force with high recall") {
    val brute = Similarity.bruteForcePairs(clusteredVecs, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.embeddingNearDupPairs(clusteredVecs, "vec_id", "embedding",
      threshold = 0.9, dim = 16, numPlanes = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // Exactness: every LSH pair is verified with true cosine, so LSH ⊆ brute.
    assert(lsh.subsetOf(brute), s"LSH emitted non-qualifying pairs: ${lsh -- brute}")
    assert(brute.nonEmpty, "test corpus produced no near-dup pairs")
    val recall = lsh.size.toDouble / brute.size
    // 8 planes + 1-bit probing over tight clusters: near-total recall.
    assert(recall >= 0.8, s"recall $recall below 0.8 (${lsh.size}/${brute.size})")
    // Multi-table amplification: still exact-verified (subset), recall can
    // only grow (candidate set is a union over tables).
    val multi = Similarity.embeddingNearDupPairs(clusteredVecs, "vec_id", "embedding",
      threshold = 0.9, dim = 16, numPlanes = 8, numTables = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(multi.subsetOf(brute), s"multi-table emitted non-qualifying pairs: ${multi -- brute}")
    assert(lsh.subsetOf(multi), "table 0 candidates lost under amplification")
  }

  // --- IVF-PQ: product-quantized ANN ---

  test("pqCodebooks slices the deterministic sample; codes stay in range") {
    val books = Similarity.pqCodebooks(clusteredVecs, "vec_id", "embedding",
      dim = 16, m = 4, ksub = 8)
    assert(books.size === 4 && books.forall(_.size === 8))
    assert(books.forall(_.forall(_.length === 4)))
    // Subspace slices of one sampled row must agree across subspaces
    // (same source rows feed every codebook at refineIters=0).
    val full = books.transpose.map(_.flatten.toSeq) // code -> reconstructed row
    assert(full.forall(_.size === 16))
  }

  test("ivfPq ADC score equals q·centroid + q·reconstructed residual") {
    // Residual IVF-PQ (the FAISS construction): a neighbor's score
    // decomposes as the exact q·coarse_centroid(cell) term plus the inner
    // product with its reconstructed RESIDUAL. Recompute the whole chain
    // driver-side — coarse assignment, residual, L2-argmin encode,
    // reconstruct — and pin the engine's adc against it.
    val coarse = Similarity.kmeansCentroids(clusteredVecs, "vec_id", "embedding",
      k = 2, iters = 0)
    val books = Similarity.pqCodebooks(clusteredVecs, "vec_id", "embedding",
      dim = 16, m = 4, ksub = 8, coarse = Some(coarse))
    val q = clusteredVecs.where(col("vec_id") === 0)
    val got = Similarity.ivfPqTopK(clusteredVecs, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 3, dim = 16, nlist = 2, nprobe = 2,
        m = 4, ksub = 8)
      .select("neighbor_id", "adc").as[(Long, Double)].collect().toMap
    val rows = clusteredVecs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val qv = rows(0L)
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cellOf(v: Seq[Double]): Int = {
      val cos = coarse.map(c => dot(v, c.toSeq) / (math.sqrt(dot(v, v)) * math.sqrt(dot(c.toSeq, c.toSeq))))
      // strict > keeps the smallest index on ties (CellAlgo's tiebreak)
      cos.zipWithIndex.reduceLeft((a, b) => if (b._1 > a._1) b else a)._2
    }
    def encode(r: Seq[Double]): Seq[Int] = (0 until 4).map { sub =>
      val sv = r.slice(sub * 4, sub * 4 + 4)
      books(sub).zipWithIndex.minBy { case (c, i) =>
        (c.zip(sv).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }._2
    }
    got.foreach { case (nid, adc) =>
      val v = rows(nid)
      val cell = cellOf(v)
      val resid = v.zip(coarse(cell).toSeq).map { case (a, b) => a - b }
      val rec = encode(resid).zipWithIndex.flatMap { case (code, sub) => books(sub)(code) }
      val expected = dot(qv, coarse(cell).toSeq) + dot(qv, rec)
      assert(math.abs(adc - expected) < 1e-9,
        s"adc for $nid: $adc vs reconstructed $expected")
    }
  }

  test("ivfPqTopK recall against brute force is high on clustered vectors") {
    val qs = clusteredVecs.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(clusteredVecs, "vec_id", "embedding",
        qs, "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.ivfPqTopK(clusteredVecs, "vec_id", "embedding",
        qs, "vec_id", "embedding", k = 4, dim = 16, nlist = 4, nprobe = 4,
        m = 4, ksub = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      (pq.getOrElse(q, Set.empty) intersect truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // Residual encoding (quantize x - coarse_centroid, not x) recovers the
    // full true neighborhood on this fixture (measured mean 1.0 vs ~0.7
    // for raw-vector codebooks at the same m x ksub budget); 0.9 leaves
    // headroom for fixture drift without masking a regression to raw.
    assert(mean >= 0.9, s"mean recall@4 $mean below 0.9")
  }

  test("ivfPqTopKRerank: exact re-rank dominates plain ADC recall, scores are true cosines") {
    val qs = clusteredVecs.where(col("vec_id") < 10)
    def neighborSets(df: DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = Similarity.bruteForceTopK(clusteredVecs, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 4)
    val bruteSets = neighborSets(brute)
    val plain = neighborSets(Similarity.ivfPqTopK(clusteredVecs, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 4, dim = 16, nlist = 4, nprobe = 2, m = 4, ksub = 8))
    val rerank = Similarity.ivfPqTopKRerank(clusteredVecs, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 4, dim = 16, nlist = 4, nprobe = 2,
      m = 4, ksub = 8, refineFactor = 4)
    val rerankSets = neighborSets(rerank)
    def meanRecall(got: Map[Long, Set[Long]]) = {
      val r = bruteSets.map { case (q, truth) =>
        (got.getOrElse(q, Set.empty) intersect truth).size.toDouble / truth.size }
      r.sum / r.size
    }
    assert(meanRecall(rerankSets) >= meanRecall(plain),
      s"re-rank recall ${meanRecall(rerankSets)} below plain ADC ${meanRecall(plain)}")
    // re-ranked scores are TRUE cosines: wherever re-rank and brute force
    // agree on a neighbor, they agree on its score exactly
    val bruteCos = brute.select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val rerankCos = rerank.select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val shared = bruteCos.keySet intersect rerankCos.keySet
    assert(shared.nonEmpty)
    shared.foreach(k => assert(bruteCos(k) === rerankCos(k)))
  }

  test("k-means-refined PQ codebooks still produce a full valid ranking") {
    // Refined cell means are unordered float sums (not bit-reproducible
    // across partitionings — the documented reason refined variants are
    // never oracled), so this pins validity, not byte-equality: dense
    // ranks from 1, finite scores, self excluded.
    val rows = Similarity.ivfPqTopK(clusteredVecs, "vec_id", "embedding",
      clusteredVecs.where(col("vec_id") === 0), "vec_id", "embedding",
      k = 3, dim = 16, nlist = 2, nprobe = 2, m = 4, ksub = 8, refineIters = 2)
      .select("rank", "neighbor_id", "adc").as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) === Seq(1, 2, 3))
    assert(rows.forall { case (_, nid, adc) => nid != 0L && !adc.isNaN && !adc.isInfinite })
  }

  test("hyperplanes are deterministic under a seed") {
    val a = Similarity.hyperplanes(8, 4, seed = 7L)
    val b = Similarity.hyperplanes(8, 4, seed = 7L)
    assert(a.map(_.toSeq) === b.map(_.toSeq))
  }

  // ---- SemDeDup (k-means-scoped semantic dedup) ----

  /** Two tight directional families plus an outlier — enough rows that a
    * 2-means split separates the families.
    */
  private def families: DataFrame = (
    (0L until 8L).map(i => (i, Seq(1.0f, 0.01f * i, 0.0f, 0.0f))) ++
      (10L until 18L).map(i => (i, Seq(0.0f, 0.0f, 1.0f, 0.01f * (i - 10)))) :+
      (20L, Seq(-1.0f, 0.5f, -0.5f, 0.2f))
  ).toDF("vec_id", "embedding")

  test("semanticNearDupPairs at one cell equals brute force exactly") {
    val got = Similarity.semanticNearDupPairs(families, "vec_id", "embedding",
        threshold = 0.995, nlist = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = Similarity.bruteForcePairs(families, "vec_id", "embedding", 0.995)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("semanticNearDupPairs with clusters finds within-family pairs only") {
    val pairs = Similarity.semanticNearDupPairs(families, "vec_id", "embedding",
        threshold = 0.99, nlist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // structural recall contract: every surviving pair is a true near-dup
    // pair, and no pair crosses the two orthogonal families
    val brute = Similarity.bruteForcePairs(families, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(brute))
    assert(pairs.forall { case (a, b) => (a < 10) === (b < 10) })
    // both families are internally near-duplicate, so pairs survive in each
    assert(pairs.exists(_._1 < 8) && pairs.exists(_._1 >= 10))
  }

  test("semanticNearDupPairs is deterministic across partitioning") {
    def run(df: DataFrame) =
      Similarity.semanticNearDupPairs(df, "vec_id", "embedding", 0.99, nlist = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(run(families) === run(families.repartition(5)))
  }

  test("semanticNearDupPairs nprobe=2 recovers pairs without inventing any") {
    def run(nlist: Int, nprobe: Int) =
      Similarity.semanticNearDupPairs(families, "vec_id", "embedding",
          threshold = 0.99, nlist = nlist, nprobe = nprobe)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForcePairs(families, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // monotone recall: every nprobe=1 pair survives, everything found is
    // a true pair, and fragmenting the space (nlist up) loses pairs that
    // the second probe then wins back
    for (nl <- Seq(3, 6)) {
      val one = run(nl, 1)
      val two = run(nl, 2)
      assert(one.subsetOf(two) && two.subsetOf(brute), s"nlist=$nl")
    }
    assert(run(6, 2).size >= run(6, 1).size)
  }

  test("filtered knn: pre-filter keeps k results where post-filtering loses them") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 3)
    val pred = pmod(col("label"), lit(2)) === 0
    val k = 5
    // pre-filter: filter the corpus, then rank — always k hits (corpus
    // side has plenty of matching rows)
    val pre = Similarity.bruteForceTopK(emb.where(pred), "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(pre.values.forall(_ === k.toLong))
    // post-filter: rank first, filter the top-k after — returns FEWER
    // than k whenever odd-label neighbors occupied top slots (the recall
    // hole ES's knn filter exists to close)
    val post = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .where(pred)
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(post.values.exists(_ < k.toLong),
      "post-filter kept k hits for every query — fixture too easy to demonstrate the hole")
    // the shared-index IVF pre-filter returns only predicate-passing
    // neighbors, and at nprobe=nlist it equals the filtered brute force
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 0)
    val idx = Similarity.assignCells(emb.where(pred), "vec_id", "embedding", cents)
    val ivf = Similarity.ivfTopKFromIndex(idx, cents, queries, "vec_id", "embedding",
      k, nprobe = 4)
    val bruteRows = Similarity.bruteForceTopK(emb.where(pred), "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .collect().map(_.toSeq).toSeq
    assert(ivf.collect().map(_.toSeq).toSeq === bruteRows)
  }

  test("bruteForceRadius: inclusive threshold cut, no k bound, self excluded") {
    import spark.implicits._
    // hand vectors with known cosines to q=(1,0): (1,0)=1, (0,1)=0,
    // (1,1)=1/sqrt(2)≈0.707, (-1,0)=-1
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val q = corpus.where($"vec_id" === 0L)
    def hits(tau: Double, self: Boolean = true): Set[Long] =
      Similarity.bruteForceRadius(corpus, "vec_id", "embedding",
          q, "vec_id", "embedding", tau, excludeSelf = self)
        .select("neighbor_id").as[Long].collect().toSet
    assert(hits(0.5) === Set(2L)) // 0.707 in, 0 and -1 out, self excluded
    assert(hits(0.0) === Set(1L, 2L)) // inclusive: cos = 0 exactly is IN
    assert(hits(0.5, self = false) === Set(0L, 2L))
    assert(hits(-1.0).size === 3) // radius -1 keeps everything (minus self)
    intercept[IllegalArgumentException](
      Similarity.bruteForceRadius(corpus, "vec_id", "embedding",
        q, "vec_id", "embedding", 1.5))
  }

  test("maxSimTopK: per-query-token max over doc tokens, summed — hand values, ties on id") {
    import spark.implicits._
    // doc 1: tokens (1,0) and (0,1); doc 2: tokens (0.5,0.5) and (0,0);
    // doc 3: one token (1,1). Query tokens (1,0) and (0,2):
    //   d1: max(1,0) + max(0,2)     = 1 + 2 = 3
    //   d2: max(0.5,0) + max(1,0)   = 0.5 + 1 = 1.5
    //   d3: max(1) + max(2)         = 1 + 2 = 3  (ties with d1 → id order)
    val docs = Seq(
      (1L, Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))),
      (2L, Seq(Seq(0.5f, 0.5f), Seq(0.0f, 0.0f))),
      (3L, Seq(Seq(1.0f, 1.0f)))).toDF("id", "toks")
    val out = Similarity.maxSimTopK(docs, "id", "toks",
      Seq(Seq(1.0, 0.0), Seq(0.0, 2.0)), k = 2).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 3L)) // 3.0 tie → id asc
    assert(out.map(_.getDouble(1)).toSeq === Seq(3.0, 3.0))
    val all = Similarity.maxSimTopK(docs, "id", "toks",
      Seq(Seq(1.0, 0.0), Seq(0.0, 2.0)), k = 5).collect()
    assert(all.map(r => r.getLong(0) -> r.getDouble(1)).toSeq ===
      Seq(1L -> 3.0, 3L -> 3.0, 2L -> 1.5))
    intercept[IllegalArgumentException](
      Similarity.maxSimTopK(docs, "id", "toks", Seq(Seq(1.0), Seq(1.0, 2.0)), 2))
    intercept[IllegalArgumentException](
      Similarity.maxSimTopK(docs, "id", "toks", Seq.empty, 2))
  }

  test("bbqTopK: Hamming candidate cut then exact rescore — hand values, pruning observable") {
    import spark.implicits._
    // q = (1,-1,.5,-.5), thresholds 0 → query bits (T,F,T,F)
    val corpus = Seq(
      (1L, Array(2.0f, -3.0f, 1.0f, -1.0f)), // bits TFTF → hamming 4, dot 6
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f)), // TTTT → hamming 2, dot 0
      (3L, Array(-1.0f, -1.0f, -1.0f, -1.0f)), // FFFF → hamming 2, dot 0
      (4L, Array(0.5f, -0.5f, 0.25f, -0.25f))) // TFTF → hamming 4, dot 1.25
      .toDF("vec_id", "embedding")
    val q = Seq(1.0, -1.0, 0.5, -0.5)
    val t = Seq(0.0, 0.0, 0.0, 0.0)
    val top2 = Similarity.bbqTopK(corpus, "vec_id", "embedding", q, t, k = 2, candidates = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(top2.toSeq === Seq((1L, 4L, 6.0), (4L, 4L, 1.25)))
    // the candidate cut is observable: hamming ties (2,3) break on id, so
    // doc 3 never reaches the rescore even though its exact dot ties doc 2
    val top3 = Similarity.bbqTopK(corpus, "vec_id", "embedding", q, t, k = 3, candidates = 3)
      .collect().map(_.getLong(0))
    assert(top3.toSeq === Seq(1L, 4L, 2L))
    intercept[IllegalArgumentException](
      Similarity.bbqTopK(corpus, "vec_id", "embedding", q, Seq(0.0), 2, 3))
    intercept[IllegalArgumentException](
      Similarity.bbqTopK(corpus, "vec_id", "embedding", q, t, k = 4, candidates = 3))
  }
}
