package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup operators: exactness of exact/ngram paths, recall of the LSH paths,
  * determinism of tie-breaks.
  */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact dedup keeps the smallest tiebreaker per key, deterministically") {
    val df = Seq(
      (3L, "dup", "c"), (1L, "dup", "a"), (2L, "dup", "b"), (4L, "uniq", "d"),
    ).toDF("id", "text", "payload")
    val out = Dedup.exact(df, Seq("text"), "id").orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(out === Seq((1L, "dup", "a"), (4L, "uniq", "d")))
  }

  test("exact dedup keeps a REAL row when a group's tieBreaker is all null") {
    // min_by skips null ordering values — without the (isNull, value)
    // ordering key, an all-null-tieBreaker group aggregated to a null
    // struct and unpacked as an all-null row, dropping the group's data.
    val df = Seq(
      ("a", Option(2L), "x"), ("a", Option(1L), "y"),
      ("b", Option.empty[Long], "keep-me"), ("b", Option.empty[Long], "keep-me-too"),
    ).toDF("k", "id", "payload")
    val out = Dedup.exact(df, Seq("k"), "id")
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(out.head === (("a", Some(1L), "y")))
    val b = out(1)
    assert(b._1 === "b" && b._2.isEmpty && b._3.startsWith("keep-me"),
      s"all-null-tieBreaker group lost its row: $b")
    // mixed null/non-null: the non-null tiebreaker wins
    val mixed = Seq(("m", Option.empty[Long], "n"), ("m", Option(5L), "v"))
      .toDF("k", "id", "payload")
    assert(Dedup.exact(mixed, Seq("k"), "id").select("payload")
      .as[String].head() === "v")
  }

  test("fingerprint dedup collapses case/punctuation variants") {
    val df = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "HELLO  WORLD"), (4L, "other doc"),
    ).toDF("id", "text")
    val out = Dedup.exactByFingerprint(df, "text", "id")
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 4L))
  }

  test("jaccard column: known overlap") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
    assert(df.select(Dedup.jaccard(col("a"), col("b"))).as[Double].head() === 0.5)
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    assert(empty.select(Dedup.jaccard(col("a"), col("b"))).as[Double].head() === 0.0)
  }

  /** Tiny corpus with one true near-dup pair, one exact dup pair, and noise. */
  private def corpus: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (4L, "completely different content about database query optimization techniques"),
    (5L, "yet another unrelated document on distributed stream processing systems"),
  ).toDF("doc_id", "text")

  /** Reference all-pairs Jaccard via the brute-force definition. */
  private def bruteForcePairs(threshold: Double, k: Int): Set[(Long, Long)] = {
    val sets = corpus
      .select(col("doc_id"), Dedup.shingles(col("text"), k).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).toSet.intersect(sets(b).toSet).size
      union = sets(a).toSet.union(sets(b).toSet).size
      if union > 0 && inter.toDouble / union >= threshold
    } yield (a, b)).toSet
  }

  test("ngramJaccardPairs equals the brute-force all-pairs definition") {
    val expected = bruteForcePairs(0.5, 2)
    assert(expected.nonEmpty) // sanity: fixture has qualifying pairs
    val got = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = 0.5, shingleK = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === expected)
    // jaccard value of the exact-dup pair is 1.0
    val j13 = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5, 2)
      .where(col("id_a") === 1 && col("id_b") === 3).select("jaccard").as[Double].head()
    assert(j13 === 1.0)
  }

  test("prefix-filtered ngram pairs equal the unfiltered exact definition") {
    // exactness must hold across thresholds and shingle sizes: the prefix
    // only prunes candidates that provably cannot reach the threshold
    for (t <- Seq(0.3, 0.5, 0.8); k <- Seq(2, 3)) {
      val full = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", t, k)
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.ngramJaccardPairsPrefix(corpus, "doc_id", "text", t, k)
        .as[(Long, Long, Double)].collect().toSet
      assert(pref === full, s"threshold=$t shingleK=$k")
    }
    assert(Dedup.ngramJaccardPairsPrefix(corpus, "doc_id", "text", 0.5, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet === bruteForcePairs(0.5, 2))
  }

  test("minhash near-dup pairs find the true pairs (banding recall at high jaccard)") {
    val got = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
      threshold = 0.5, shingleK = 2, numBands = 32, rowsPerBand = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact verification bounds results to the brute-force set; banding at
    // b=32,r=2 finds jaccard>=0.5 pairs with prob > 1-1e-4
    assert(got === bruteForcePairs(0.5, 2))
  }

  test("simhash near-dup pairs: exact dups at distance 0, noise absent") {
    val got = Dedup.simhashNearDupPairs(corpus, "doc_id", "text", maxHamming = 3, numChunks = 4)
      .as[(Long, Long, Int)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 3L)))             // identical text
    assert(got.find(r => (r._1, r._2) == ((1L, 3L))).get._3 === 0)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // noise stays out
  }

  test("simhash parameter validation") {
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(corpus, "doc_id", "text", maxHamming = 4, numChunks = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(corpus, "doc_id", "text", maxHamming = 1, numChunks = 5)
    }
  }

  test("connectedComponents labels transitive clusters with the min id") {
    // chain 1-2-3, pair 7-9, singleton 5 absent from pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents distributed path agrees with the union-find fast path") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val dist = Dedup.connectedComponents(pairs, driverMaxPairs = 0)
      .as[(Long, Long)].collect().toMap
    assert(dist === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("keepClusterRepresentatives keeps unique rows and one per cluster") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (5L, "b"), (7L, "c"), (9L, "c"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val kept = Dedup.keepClusterRepresentatives(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 5L, 7L))
  }

  test("end-to-end cluster dedup: ngram pairs to representatives") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5, 2)
    val kept = Dedup.keepClusterRepresentatives(corpus, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // docs 1,2,3 cluster (rep 1); 4 and 5 are unique
    assert(kept === Seq(1L, 4L, 5L))
  }

  test("minhash cluster dedup equals ngram cluster dedup where banding recall is certain") {
    // Identical token sets (case/punctuation variants) have identical shingle
    // sets, hence identical MinHash signatures, hence collide in EVERY band —
    // recall on this fixture is 100% by construction, not probabilistically.
    // False candidates are removed by exact Jaccard verification in both
    // paths, so the two cluster-keep pipelines must agree exactly.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The QUICK brown fox jumps over the lazy dog!"),
      (3L, "the quick   brown fox JUMPS over the lazy dog."),
      (4L, "completely different content about database query optimization"),
      (5L, "yet another unrelated document on stream processing systems"),
      (6L, "Completely different content about database query optimization?"),
    ).toDF("doc_id", "text")
    def kept(pairs: DataFrame): Seq[Long] =
      Dedup.keepClusterRepresentatives(docs, "doc_id", pairs)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val viaNgram = kept(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 1.0, 3))
    val viaMinhash = kept(Dedup.minhashNearDupPairs(docs, "doc_id", "text", 1.0, 3))
    assert(viaMinhash === viaNgram)
    assert(viaMinhash === Seq(1L, 4L, 5L))
  }

  test("shingles of short docs are empty and excluded from pair generation") {
    val df = Seq((1L, "word"), (2L, "word")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(df, "doc_id", "text", 0.5, 2).count() === 0)
  }

  test("portable minhash agrees with the xxhash64 kernel where banding recall is certain") {
    // At threshold 1.0 with any banding, exact duplicates are identical in
    // EVERY band (certain recall for both hash families), so the two
    // variants must produce the same verified pairs despite different
    // hashes driving their buckets.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The QUICK brown fox jumps over the lazy dog!"),
      (3L, "completely different content about database query optimization"),
      (4L, "Completely different content about database query optimization?"),
      (5L, "yet another unrelated document on stream processing"),
    ).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val fast = pairs(Dedup.minhashNearDupPairs(docs, "doc_id", "text", 1.0, 3))
    val portable = pairs(Dedup.minhashNearDupPairsPortable(docs, "doc_id", "text", 1.0, 3))
    assert(portable === fast)
    assert(portable === Set((1L, 2L), (3L, 4L)))
  }

  test("portable simhash: analyzer-equal docs collide at hamming 0, like the kernel") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The QUICK brown fox jumps over the lazy dog!"), // analyzer-equal to 1
      (3L, "an entirely different document about query engines"),
    ).toDF("doc_id", "text")
    val portable = Dedup.simhashNearDupPairsPortable(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long, Int)].collect().toSet
    val fast = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(portable.contains((1L, 2L, 0)))
    assert(fast.contains((1L, 2L, 0)))
    // different hash families may disagree on borderline NEAR dups, never
    // on token-identical ones
    assert(portable.filter(_._3 == 0) === fast.filter(_._3 == 0))
  }

  test("exactIncremental: batch rows drop against the store AND within the batch") {
    val yesterday = Seq(
      (1L, "the quick brown fox"),
      (2L, "something about streams")).toDF("doc_id", "text")
    val store = Dedup.fingerprints(yesterday, "text")
    val today = Seq(
      (10L, "The QUICK brown fox!"),     // dup of stored doc 1 → dropped
      (11L, "fresh document one"),       // new → kept
      (12L, "Fresh   DOCUMENT one"),     // within-batch dup of 11 → dropped
      (13L, "fresh document two")).toDF("doc_id", "text")
    val accepted = Dedup.exactIncremental(today, "text", "doc_id", store)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(accepted === Seq(11L, 13L))
    // two consecutive days are associative with the store appended between:
    // re-running yesterday's rows against the updated store accepts nothing
    val updated = store.unionByName(
      Dedup.fingerprints(Dedup.exactIncremental(today, "text", "doc_id", store), "text"))
    assert(Dedup.exactIncremental(yesterday, "text", "doc_id", updated).count() === 0)
  }

  test("exactIncrementalBloom accepts the same set; states merge across batches") {
    val yesterday = Seq(
      (1L, "the quick brown fox"),
      (2L, "something about streams"),
      (3L, "a third stored doc")).toDF("doc_id", "text")
    val store = Dedup.fingerprints(yesterday, "text")
    // per-batch Bloom states over a SPLIT store (the at-rest shape): the
    // merged filter must behave as one built over the whole store
    val states = Dedup.fingerprintBloomState(
        store.where($"fp" % 2 === 0), expectedItems = 100, numBits = 2048)
      .unionByName(Dedup.fingerprintBloomState(
        store.where($"fp" % 2 =!= 0), expectedItems = 100, numBits = 2048))
    val today = Seq(
      (10L, "The QUICK brown fox!"),     // dup of stored doc 1 → dropped
      (11L, "fresh document one"),       // new → kept
      (12L, "Fresh   DOCUMENT one"),     // within-batch dup of 11 → dropped
      (13L, "fresh document two"),
      (14L, null.asInstanceOf[String])). // undefined → dropped
      toDF("doc_id", "text")
    val viaBloom = Dedup.exactIncrementalBloom(today, "text", "doc_id", store, states)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val plain = Dedup.exactIncremental(today, "text", "doc_id", store)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaBloom === plain)
    assert(viaBloom === Seq(11L, 13L))
  }

  test("exactIncremental: null-text rows are dropped, never poison the store") {
    // a null fingerprint would survive a LEFT ANTI join (always "not seen")
    // while the oracle's NOT IN drops it — and a null IN the store would
    // make NOT IN reject every row. Both sides define nulls away.
    val yesterday = Seq((1L, "kept doc"), (2L, null)).toDF("doc_id", "text")
    val store = Dedup.fingerprints(yesterday, "text")
    assert(store.count() === 1) // the null text contributed no fingerprint
    val today = Seq(
      (10L, null),              // undefined content → dropped
      (11L, "fresh document")).toDF("doc_id", "text")
    val accepted = Dedup.exactIncremental(today, "text", "doc_id", store)
      .select("doc_id").as[Long].collect().toSeq
    assert(accepted === Seq(11L))
  }

  test("tfCosinePairs: hand-computed integer TF cosine, repeats weighted") {
    val docs = Seq(
      (1L, "a a b"),           // tf {a:2, b:1}, ||.||² = 5
      (2L, "a b b"),           // tf {a:1, b:2}, ||.||² = 5
      (3L, "A a B!"),          // analyzer-equal to doc 1 → cosine 1.0
      (4L, "c d e"),           // disjoint from 1-3 → no pair at all
    ).toDF("doc_id", "text")
    // maxDfPermille = 1000 keeps the whole tiny vocabulary in play
    val got = Dedup.tfCosinePairs(docs, "doc_id", "text", tau = 0.5, maxDfPermille = 1000)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    // dot(1,2) = 2·1 + 1·2 = 4; cosine = 4 / (√5·√5) — the exact IEEE
    // value (√5·√5 is one ulp under 5, deliberately not rounded away:
    // the oracle hash-matches these exact bits)
    val c = 4.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    val one = 5.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(got === Seq(
      (1L, 2L, c),
      (1L, 3L, one),
      (2L, 3L, c)))
    // the SET view (Jaccard on 1-token shingles) cannot tell 1 from 2 —
    // identical token sets — while TF-cosine resolves the repeat weighting
    assert(got.find(p => p._1 == 1L && p._2 == 2L).get._3 < 1.0)
  }

  test("tfCosinePairs drops ubiquitous tokens from the vector space") {
    // 'the' appears in every doc (1000 permille); docs 1 and 2 share ONLY
    // it. At maxDfPermille = 500 the stopword leaves the space: 1-2 lose
    // their pair, while 3-4 still match on discriminative tokens.
    val docs = Seq(
      (1L, "the alpha"),
      (2L, "the beta"),
      (3L, "the gamma delta"),
      (4L, "the gamma delta"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.tfCosinePairs(docs, "doc_id", "text", tau = 0.5, maxDfPermille = 500)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((3L, 4L)))
    // with the cutoff off, the shared stopword alone makes 1-2 similar
    // (tau below 1/2: the exact IEEE cosine is one ulp UNDER 0.5 — √2·√2
    // is one ulp over 2)
    val noCut = Dedup.tfCosinePairs(docs, "doc_id", "text", tau = 0.45, maxDfPermille = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(noCut.contains((1L, 2L)))
  }

  test("repeatedSegmentFilter: corpus-repeated spans cut, docs reassemble in order") {
    val docs = Seq(
      (1L, "aaa bbb ccc ddd eee fff"),
      (2L, "aaa bbb ccc xxx yyy zzz"),
      (3L, "one two three"),
      (4L, "ppp qqq rrr"), // exact duplicates: their only span repeats →
      (5L, "ppp qqq rrr"), // both annihilate (documented C4 behavior)
      (6L, "s1 s2 s3 s4")  // 4 tokens at window 3: last span truncates
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSegmentFilter(docs, "doc_id", "text",
        window = 3, maxOccurrences = 1)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 1L, "ddd eee fff"),
      (2L, 1L, 1L, "xxx yyy zzz"),
      (3L, 0L, 1L, "one two three"),
      (4L, 1L, 0L, ""),
      (5L, 1L, 0L, ""),
      (6L, 0L, 2L, "s1 s2 s3 s4")))
    // raising the occurrence line spares the duplicated span everywhere
    val lax = Dedup.repeatedSegmentFilter(docs, "doc_id", "text",
        window = 3, maxOccurrences = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(lax.forall(_._2 == 0L))
  }

  test("duplicateSpanRemoval: alignment-free covered-token cut (ExactSubstr)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      // the shared 5-token run sits at a DIFFERENT alignment — the case
      // window-aligned segments (repeatedSegmentFilter) structurally miss
      (2L, "x alpha beta gamma delta epsilon y"),
      (3L, "solo words here"),                 // shorter than minLen: untouched
      (4L, "p q r s t p q r s t")              // within-doc repetition counts too
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanRemoval(docs, "doc_id", "text", minLen = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 6L, 5L, "zeta"),
      (2L, 7L, 5L, "x y"),
      (3L, 3L, 0L, "solo words here"),
      (4L, 10L, 10L, "")))
    // the window-aligned filter misses the shifted duplicate entirely
    val aligned = Dedup.repeatedSegmentFilter(docs.where(col("doc_id") <= 2),
        "doc_id", "text", window = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(aligned.forall(_._2 == 0L), "window-aligned segments see no duplicate")
  }
}
