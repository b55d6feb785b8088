package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: concatenate documents in a
  * deterministic order and chunk the token stream into fixed-length
  * training sequences ("concat-and-chunk", the standard GPT-style packing;
  * public knowledge). Output maps each document to the sequence(s) it lands
  * in, as `(bucket, seq, id, slice_begin, slice_len)` — a doc spanning a
  * boundary is split across consecutive sequences, so every sequence except
  * each bucket's last is EXACTLY `seqLen` tokens with zero padding.
  *
  * 100 TB shape: packing is a prefix-sum, which is inherently sequential —
  * so the stream is sharded into `numBuckets` independent streams first
  * (`id mod numBuckets`), and each bucket packs alone. ONE hash exchange on
  * the bucket key + a per-bucket sort (the window); the boundary explode is
  * row-local. Pick `numBuckets` ≳ cluster cores: each bucket's window is
  * one task's sequential scan, and sequences never cross buckets, so the
  * result is reproducible under any parallelism. Token *offsets* stay
  * per-bucket exact integers (`div`, not float division), immune to row
  * counts.
  */
object Packing {

  /** Pack `docs` into `seqLen`-token sequences over `numBuckets` independent
    * streams ordered by `idCol` (numeric id; hash a string id to a long
    * first — the bucket function must restate in the oracle's dialect,
    * which is why this takes the id, not an opaque hash).
    *
    * Docs with a non-positive token count are dropped (nothing to pack).
    * Output: `bucket`, `seq` (per-bucket sequence index), `idCol`,
    * `slice_begin` (token offset within the doc), `slice_len`.
    */
  def packConcatChunk(
      docs: DataFrame,
      idCol: String,
      tokenCount: Column,
      seqLen: Int,
      numBuckets: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(seqLen > 0, s"pack: seqLen must be positive, got $seqLen")
    require(numBuckets > 0, s"pack: numBuckets must be positive, got $numBuckets")
    val id = col(s"`$idCol`")
    val carried = carry.map(c => col(s"`$c`"))
    val keyed = docs
      .select(id +: tokenCount.cast("long").as("_tok") +: carried: _*)
      .where(col("_tok") > 0)
      .withColumn("_bucket", pmod(id, lit(numBuckets.toLong)))
    val w = Window.partitionBy("_bucket").orderBy(id)
    val L = lit(seqLen.toLong)
    keyed
      .withColumn("_start", sum(col("_tok")).over(w) - col("_tok"))
      // Integer `div`, not floor(double /): exact at any per-bucket prefix
      // sum, not just below 2^53.
      .withColumn("_first", expr(s"_start div ${seqLen}L"))
      .withColumn("_last", expr(s"(_start + _tok - 1) div ${seqLen}L"))
      .withColumn("seq", explode(sequence(col("_first"), col("_last"))))
      .select(
        col("_bucket").as("bucket") +:
          col("seq") +:
          id +:
          greatest(lit(0L), col("seq") * L - col("_start")).as("slice_begin") +:
          (least(col("_tok"), (col("seq") + 1) * L - col("_start")) -
            greatest(lit(0L), col("seq") * L - col("_start"))).as("slice_len") +:
          carried: _*)
  }

  /** Materialized training sequences: the actual space-joined token stream
    * of every packed sequence, `(bucket, seq, seq_text, n_tokens)` —
    * the shard-writing step after [[packConcatChunk]]'s assignment.
    *
    * Token arrays ride THROUGH the packing window (same rows that must
    * reach sequence assembly anyway), so the whole materialization is the
    * window's one bucket exchange plus an aggregation that rides its
    * clustering — no second join back to the corpus, no extra shuffle of
    * text. Within a sequence, documents concatenate in ascending id order
    * (`array_sort` on (id, slice) structs — deterministic under any
    * parallelism).
    */
  def materializeSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int,
      numBuckets: Int): DataFrame = {
    val withToks = docs.withColumn("_toks", split(trim(col(s"`$textCol`")), "\\s+"))
    packConcatChunk(withToks, idCol,
        graft.ops.TextAnalysis.tokenCount(col(s"`$textCol`")), seqLen, numBuckets,
        carry = Seq("_toks"))
      .withColumn("_slice", slice(col("_toks"), (col("slice_begin") + 1).cast("int"), col("slice_len").cast("int")))
      .groupBy("bucket", "seq")
      .agg(
        concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col(s"`$idCol`"), col("_slice")))),
          x => x.getField("_slice")))).as("seq_text"),
        sum("slice_len").as("n_tokens"))
  }

  /** Fill statistics per sequence: `(bucket, seq, tokens)` — every sequence
    * except each bucket's last must hold exactly `seqLen` tokens (the
    * invariant PackingSpec pins).
    */
  def sequenceFill(packed: DataFrame): DataFrame =
    packed.groupBy("bucket", "seq")
      .agg(sum("slice_len").as("tokens"))

  /** Length-grouped bin packing (homogeneous batching — the fairseq/T5
    * "bucket by length" discipline, public knowledge): documents with the
    * SAME token count `L` fill bins of `k = seqLen div L` docs each, so a
    * bin holds `k·L ≤ seqLen` tokens of identical-length documents —
    * no cross-document attention, intra-bin padding zero, and the only
    * waste is the common `seqLen − k·L` tail. The complement of
    * [[packConcatChunk]]: that one splits documents to fill sequences
    * exactly; this one never splits and never mixes lengths. Documents
    * longer than `seqLen` are excluded (route them to concat-chunk).
    *
    * Rank within a length group is seeded-hash order. 100 TB shape: real
    * corpora concentrate on head lengths, so a naive per-length window is
    * one sequential task per popular length — instead the rank rides the
    * same bucketed two-phase prefix machinery as
    * [[graft.ops.Sampling.tokenBudgetSelect]]: hash-RANGE buckets
    * (monotone in the hash, so bucket order IS hash order), per-(L,
    * bucket) counts fold into offsets under one bounded window
    * (lengths × buckets rows), and each bucket ranks its interior as its
    * own task — provably the global per-length rank, at per-length
    * parallelism `numBuckets`.
    *
    * Output: `(idCol, n_tok, bin, slot)` — `bin` the per-length bin
    * index, `slot` the position inside the bin.
    */
  def lengthGroupedBins(
      docs: DataFrame,
      idCol: String,
      tokenCount: Column,
      seqLen: Int,
      numBuckets: Int = 64,
      seed: Int = 42): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val id = col(s"`$idCol`")
    val keyed = docs
      .select(id, tokenCount.cast("long").as("n_tok"))
      .where(col("n_tok") >= 1 && col("n_tok") <= seqLen)
      .withColumn("_u", graft.ops.Sampling.hashUnit(id, seed))
      .withColumn("_bucket", floor(col("_u") * numBuckets).cast("long"))
    val wBuckets = Window.partitionBy("_L").orderBy("_b")
    val offsets = keyed
      .groupBy(col("n_tok").as("_L"), col("_bucket").as("_b"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_offset", sum(col("_n")).over(wBuckets) - col("_n"))
      .select(col("_L"), col("_b"), col("_offset"))
    val wInBucket = Window.partitionBy(col("n_tok"), col("_bucket"))
      .orderBy(col("_u"), id)
    keyed
      .join(broadcast(offsets),
        col("n_tok") === col("_L") && col("_bucket") === col("_b"))
      .withColumn("_rank", col("_offset") + row_number().over(wInBucket) - 1)
      .withColumn("_k", expr(s"${seqLen}L div n_tok"))
      .select(id, col("n_tok"),
        expr("_rank div _k").as("bin"),
        expr("_rank % _k").as("slot"))
  }

  /** Deterministic shard-and-shuffle assignment — the "global shuffle"
    * every epoch pipeline wants before streaming shards to trainers: shard
    * = seeded 52-bit hash of the id modulo `numShards`, `pos` = the row's
    * rank inside its shard in (hash, id) order. The hash plays both roles
    * at once: it scatters correlated ids across shards AND scrambles
    * within-shard order, so reading shards sequentially replays a global
    * pseudo-random permutation — reproducible on any cluster, restatable
    * in SQL ([[Sampling.hashBits52]]).
    *
    * 100 TB shape: one exchange on the shard key; each shard's rank is one
    * task's sort (shard count is the parallelism knob — thousands of
    * shards at corpus scale, exactly how shard writers run).
    */
  def shardAssignments(
      docs: DataFrame,
      idCol: String,
      numShards: Int,
      seed: Int = 42): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val id = col(s"`$idCol`")
    val w = Window.partitionBy("shard").orderBy(col("_h"), id)
    docs
      .withColumn("_h", graft.ops.Sampling.hashBits52(id, seed))
      .withColumn("shard", pmod(col("_h"), lit(numShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("_h")
  }

  /** Publish the shards to parquet, one directory per shard, rows stored in
    * [[shardAssignments]] order. One exchange (the repartition IS the
    * shard assignment), `numShards` files; re-reading `shard=k` in file
    * order replays shard k of the global permutation.
    */
  def publishShards(
      docs: DataFrame,
      idCol: String,
      numShards: Int,
      path: String,
      seed: Int = 42): Unit =
    shardAssignments(docs, idCol, numShards, seed)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Fill-in-the-Middle training examples (Bavarian et al. 2022): with
    * probability `fimRate` a document is rearranged into the PSM layout
    * `<PRE> prefix <SUF> suffix <MID> middle` (the model learns to infill
    * the middle span conditioned on both sides); the rest pass through
    * verbatim — the paper's mixed objective. The two cut points are the
    * SORTED pair of seeded md5-unit hashes of the id scaled by the text
    * length: deterministic per `(id, seed)`, reproducible on any cluster,
    * and restated in SQL by the same unit-hash arithmetic (the sampling
    * tier's portability discipline). Row-local — no shuffle at any
    * corpus size; character-level cuts (token-boundary snapping is the
    * tokenizer's composition, not this op's).
    *
    * Output: `(idCol, fim, fim_text)` — `fim` whether the doc was
    * transformed; reassembly invariant (spec-pinned): stripping the
    * sentinels and reordering middle back between prefix and suffix
    * reproduces the original text exactly.
    */
  def fimExamples(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      fimRate: Double,
      seed: Int = 42,
      preTok: String = "<PRE>",
      sufTok: String = "<SUF>",
      midTok: String = "<MID>"): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1, s"fimRate must be in [0,1], got $fimRate")
    val id = col(s"`$idCol`")
    val text = col(s"`$textCol`")
    val n = length(text)
    val c1 = floor(graft.ops.Sampling.hashUnit(id, seed + 1) * n).cast("int")
    val c2 = floor(graft.ops.Sampling.hashUnit(id, seed + 2) * n).cast("int")
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val transformed = concat(
      lit(preTok), text.substr(lit(1), lo),
      lit(sufTok), text.substr(hi + 1, n - hi),
      lit(midTok), text.substr(lo + 1, hi - lo))
    val gate = text.isNotNull && graft.ops.Sampling.hashUnit(id, seed) < fimRate
    docs.select(id.as(idCol),
      gate.as("fim"),
      when(gate, transformed).otherwise(text).as("fim_text"))
  }

  /** T5-style span corruption (Raffel et al. 2020, the C4 denoising
    * objective): mask `numSpans` token spans of length `spanLen` with
    * `<extra_id_i>` sentinels — `inputs` is the text with each span
    * replaced by its sentinel, `targets` is the sentinel-delimited
    * concatenation of the masked spans (closed by the final sentinel).
    * Deterministic twin of the [[fimExamples]] discipline: span
    * positions come from the portable seeded md5 unit hash, one per
    * span, each placed inside its own equal token segment (span `i`
    * lands in `[i·seg, i·seg + seg − spanLen]`) so spans can never
    * overlap and the whole construction restates as SQL list slicing.
    * Documents too short to host the spans (`seg < spanLen`) pass
    * through uncorrupted with empty targets. Row-local: split + slices +
    * concat, zero shuffle. Reassembly invariant (spec-pinned): splicing
    * the target spans back over the sentinels reproduces the original
    * token stream exactly.
    */
  def spanCorruptionExamples(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numSpans: Int = 2,
      spanLen: Int = 3,
      seed: Int = 42): DataFrame = {
    require(numSpans >= 1, s"numSpans must be >= 1, got $numSpans")
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    val id = col(s"`$idCol`")
    val text = col(s"`$textCol`")
    val toks = split(text, " ")
    val n = size(toks)
    val seg = floor(n / lit(numSpans.toDouble)).cast("int")
    val starts = (0 until numSpans).map { i =>
      lit(i) * seg + floor(graft.ops.Sampling.hashUnit(id, seed + i + 1) *
        (seg - lit(spanLen) + lit(1))).cast("int")
    }
    def sentinel(i: Int): Column = lit(s"<extra_id_$i>")
    val inPieces = Seq(slice(toks, lit(1), starts.head)) ++
      (0 until numSpans).flatMap { i =>
        val afterSpan = starts(i) + lit(spanLen) + lit(1)
        val untilTok = if (i + 1 < numSpans) starts(i + 1) else n
        Seq(array(sentinel(i)),
          slice(toks, afterSpan, untilTok - starts(i) - lit(spanLen)))
      }
    val inputs = array_join(concat(inPieces: _*), " ")
    val tgtPieces = (0 until numSpans).flatMap { i =>
      Seq(array(sentinel(i)), slice(toks, starts(i) + 1, lit(spanLen)))
    } :+ array(sentinel(numSpans))
    val targets = array_join(concat(tgtPieces: _*), " ")
    val gate = text.isNotNull && seg >= spanLen
    docs.select(id.as(idCol),
      gate.as("corrupted"),
      when(gate, inputs).otherwise(text).as("inputs"),
      when(gate, targets).otherwise(lit("")).as("targets"))
  }

  /** Curriculum ordering (Bengio et al. 2009): assign each document a
    * difficulty `stage` from monotone score thresholds (`stage` = how
    * many `bounds` the score clears) and a deterministic within-stage
    * `pace` (the portable seeded unit hash) — the `(stage, pace)` pair
    * IS the training order. Deliberately emits sort KEYS, not a sorted
    * frame: a global order would funnel the corpus through one range
    * sort, while the keys feed the existing shard writer
    * ([[shardAssignments]] / `repartitionByRange(stage, pace)` +
    * `sortWithinPartitions`) so each stage streams out in parallel —
    * the 100 TB curriculum path. Row-local, zero shuffle here.
    */
  def curriculumKeys(
      docs: DataFrame,
      idCol: String,
      scoreCol: String,
      bounds: Seq[Double],
      seed: Int = 42): DataFrame = {
    require(bounds.nonEmpty, "curriculumKeys: no stage bounds")
    require(bounds == bounds.sorted, s"bounds must ascend, got $bounds")
    val score = col(s"`$scoreCol`").cast("double")
    val stage = bounds.map(b => when(score >= lit(b), 1).otherwise(0))
      .reduce(_ + _)
    docs.withColumn("stage", stage)
      .withColumn("pace", graft.ops.Sampling.hashUnit(col(s"`$idCol`"), seed))
  }
}
