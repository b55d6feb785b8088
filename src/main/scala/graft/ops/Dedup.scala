package graft.ops

import graft.expr.SimHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Designed for the 100 TB shape:
  *
  *   - exact dedup is one shuffle on the dedup key;
  *   - MinHash signatures are computed per-row with higher-order functions
  *     (no explode of shingles, no shuffle until banding);
  *   - candidate generation goes through LSH band buckets (shuffle keyed on
  *     band hash, linear in docs × bands), never an all-pairs product;
  *   - only candidate pairs pay the exact-verification cost.
  */
object Dedup {

  /** Exact dedup: keep, per distinct value of `keyCols`, the single row with
    * the smallest `tieBreaker`. One hash-shuffle on the key; deterministic
    * regardless of partitioning (unlike `dropDuplicates`, which keeps an
    * arbitrary first row).
    */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreaker))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact dedup on a normalized content fingerprint (case/punctuation
    * variants collide) — see [[TextAnalysis.contentFingerprint]].
    */
  def exactByFingerprint(df: DataFrame, textCol: String, tieBreaker: String): DataFrame =
    exact(df.withColumn("_fp", TextAnalysis.contentFingerprint(col(textCol))), Seq("_fp"), tieBreaker)
      .drop("_fp")

  /** Lowercase word tokens of a text column. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Distinct hashed `k`-word shingles of a text column (the MinHash/Jaccard
    * item set). Documents with fewer than `k` tokens produce an empty set.
    */
  def shingles(c: Column, k: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < k, array().cast("array<bigint>")).otherwise(
      array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(k)))))))
  }

  /** MinHash signature of a shingle-set column: `numHashes` independent
    * minimums of seeded xxhash64 re-hashes. Computed entirely per-row
    * (nested `transform`, no explode): one pass, codegen-friendly.
    */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleSet, s => xxhash64(i, s))))

  /** Exact Jaccard similarity of two set columns (arrays assumed distinct). */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, 0.0).otherwise(
      size(array_intersect(a, b)).cast(DoubleType) /
        size(array_union(a, b)).cast(DoubleType))

  /** MinHash + LSH near-duplicate pairs.
    *
    * Signature of `numBands × rowsPerBand` min-hashes per document; documents
    * sharing any band bucket become candidates (standard banding: a pair with
    * Jaccard `s` collides in ≥1 band with probability `1-(1-s^r)^b`);
    * candidates are verified with exact Jaccard over the shingle sets and
    * kept at `threshold` or above.
    *
    * Returns `(id_a, id_b, jaccard)` with `id_a < id_b`, ordered.
    *
    * @param df       input documents
    * @param idCol    unique numeric/string document id
    * @param textCol  text column
    * @param shingleK words per shingle
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleK: Int = 3,
      numBands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val withSets = df
      .select(col(idCol), shingles(col(textCol), shingleK).as("_sh"))
      .where(size(col("_sh")) > 0)
    val withSig = withSets
      .withColumn("_sig", minhashSignature(col("_sh"), numHashes))
      // One row per (doc, band): band key is the hash of that band's slice.
      .withColumn("_band", explode(transform(sequence(lit(0), lit(numBands - 1)),
        j => struct(j.as("idx"), xxhash64(j, slice(col("_sig"), j * rowsPerBand + lit(1), lit(rowsPerBand))).as("h")))))
      .select(col(idCol), col("_sh"), col("_band.idx").as("_bidx"), col("_band.h").as("_bhash"))

    val a = withSig.select(col(idCol).as("id_a"), col("_sh").as("_sh_a"), col("_bidx"), col("_bhash"))
    val b = withSig.select(col(idCol).as("id_b"), col("_sh").as("_sh_b"), col("_bidx"), col("_bhash"))
    a.join(b, Seq("_bidx", "_bhash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "_sh_a", "_sh_b")
      .dropDuplicates("id_a", "id_b") // same pair may collide in several bands
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** SimHash near-duplicate pairs: 64-bit SimHash over word tokens; the
    * pigeonhole banding on `numChunks` equal bit-chunks guarantees any pair
    * within Hamming distance `numChunks - 1` shares at least one chunk;
    * candidates verified by exact Hamming distance `<= maxHamming`.
    *
    * Returns `(id_a, id_b, hamming)` with `id_a < id_b`, ordered.
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      numChunks: Int = 4): DataFrame = {
    require(64 % numChunks == 0, "numChunks must divide 64")
    require(numChunks > maxHamming, "pigeonhole needs numChunks > maxHamming")
    val chunkBits = 64 / numChunks
    val mask = if (chunkBits == 64) -1L else (1L << chunkBits) - 1
    val hashed = df
      .select(col(idCol), SimHash.simhash64(tokens(col(textCol))).as("_sim"))
      .withColumn("_chunk", explode(array((0 until numChunks).map(j =>
        struct(lit(j).as("idx"), shiftrightunsigned(col("_sim"), j * chunkBits).bitwiseAND(mask).as("v"))): _*)))
      .select(col(idCol), col("_sim"), col("_chunk.idx").as("_cidx"), col("_chunk.v").as("_cval"))

    val a = hashed.select(col(idCol).as("id_a"), col("_sim").as("_sim_a"), col("_cidx"), col("_cval"))
    val b = hashed.select(col(idCol).as("id_b"), col("_sim").as("_sim_b"), col("_cidx"), col("_cval"))
    a.join(b, Seq("_cidx", "_cval"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "_sim_a", "_sim_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("_sim_a").bitwiseXOR(col("_sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** n-gram Jaccard near-duplicate pairs with an inverted-index prefilter:
    * candidates must share at least `minCommon` shingles (generated by an
    * explode + self-join on the shingle hash — the inverted index — never a
    * cross join), then exact Jaccard filters at `threshold`.
    *
    * Best for small-to-medium corpora or high thresholds; MinHash banding
    * above is the constant-cost-per-doc path for 100 TB.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleK: Int = 3,
      minCommon: Int = 1): DataFrame = {
    val withSets = df
      .select(col(idCol), shingles(col(textCol), shingleK).as("_sh"))
      .where(size(col("_sh")) > 0)
    val inverted = withSets.select(col(idCol), explode(col("_sh")).as("_s"))
    val cand = inverted.as("x").join(inverted.as("y"), col("x._s") === col("y._s"))
      .where(col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .agg(count(lit(1)).as("_common"))
      .where(col("_common") >= minCommon)
    cand
      .join(withSets.select(col(idCol).as("id_a"), col("_sh").as("_sh_a")), Seq("id_a"))
      .join(withSets.select(col(idCol).as("id_b"), col("_sh").as("_sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy("id_a", "id_b")
  }
}
