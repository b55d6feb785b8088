package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesize an N× scale twin of a testdata corpus for scale-proof
  * benching (round-11 ask #2: measure the most expensive pipeline
  * operators at 10× rows and show ≲linear runtime growth).
  *
  * Usage: `runMain graft.tools.ScaleGen <srcSfDir> <outDir> [copies=10]`
  *
  * Two corpus modes (the suffix is ALPHANUMERIC — `q<k>` — because the
  * engine's analyzers split on non-alphanumerics, so an `_k` suffix would
  * shear off and leave the original token SHARED across copies,
  * re-creating the quadratic cross-copy volume the twin must avoid):
  *
  *  - `disjoint` (default): copy 0 is the source verbatim; copy k>0
  *    suffixes EVERY token with `q<k>`. Token-uniform suffixing means two
  *    near-duplicate documents inside one copy transform identically, so
  *    every within-copy near-dup cluster is preserved exactly; across
  *    copies NO token (hence no shingle, no TF term) is shared, so
  *    cross-copy candidate volume is zero: exactly 10× docs, 10×
  *    clusters, 10× inverted-index volume — the LINEAR shape a grown
  *    corpus has. Use for the shingle/TF dedup family.
  *  - `light`: copy k>0 suffixes only tokens with hash(t, k) odd-in-8 —
  *    ~1 in 8 tokens. Fingerprints stay distinct (exact dedup linear),
  *    language-ID/quality selectivity barely moves, and the corpus keeps
  *    realistic cross-copy n-gram overlap (decontamination flags it — as
  *    it should). Use for the composed text pipelines; NOT for similarity
  *    joins (7/8 shared vocabulary puts cross-copy cosine above any
  *    near-dup tau).
  *
  * Embeddings: copy 0 verbatim, copy k>0 deterministically perturbed per
  * (vec_id, position, k) so vectors are distinct but the space keeps its
  * cluster geometry. All randomness is hash-derived — regeneration is
  * bit-stable.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcSfDir> <outDir> [copies] [disjoint|light]")
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val light = args.length > 3 && args(3) == "light"
    val spark = SparkSession.builder()
      .appName("graft-scalegen")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .withColumn("_k", explode(sequence(lit(0), lit(copies - 1))))
    val mutated = docs.select(
      (col("doc_id") * copies + col("_k")).as("doc_id"),
      when(col("_k") === 0, col("text")).otherwise(
        concat_ws(" ", transform(
          split(col("text"), "\\s+"),
          t =>
            if (light)
              when(pmod(xxhash64(t, col("_k")), lit(8)) === 0,
                concat(t, lit("q"), col("_k"))).otherwise(t)
            else concat(t, lit("q"), col("_k"))))).as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    mutated.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .withColumn("_k", explode(sequence(lit(0), lit(copies - 1))))
    val perturbed = emb.select(
      (col("vec_id") * copies + col("_k")).as("vec_id"),
      when(col("_k") === 0, col("embedding")).otherwise(
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x + (pmod(xxhash64(col("vec_id"), col("_k"), i), lit(1000))
            .cast("float") / 1000.0f - 0.5f) * 0.1f).cast("float"))).as("embedding"),
      col("label"))
    perturbed.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    println(s"""{"documents": ${spark.read.parquet(s"$out/documents.parquet").count()}, """ +
      s""""embeddings": ${spark.read.parquet(s"$out/embeddings.parquet").count()}}""")
    spark.stop()
  }
}
