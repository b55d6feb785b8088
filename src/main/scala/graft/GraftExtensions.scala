package graft

import graft.expr._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst integration: registers every custom expression as a SQL
  * function, so the engine's full surface is reachable from `spark.sql`
  * (and any SQL-speaking client) as well as the `Column` API:
  *
  * {{{
  * spark.sql("SELECT geohash(lat, lon, 2) AS cell, count(*) FROM pts GROUP BY 1")
  * spark.sql("SELECT vec_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Wire up either way:
  *   - config: `spark.sql.extensions=graft.GraftExtensions`
  *   - code:   `GraftExtensions.register(spark)` on an existing session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  /** (name, info, builder) for every SQL-exposed expression. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("geohash",
      info("geohash", "geohash(lat, lon, precision) - base-32 geohash cell of a point"),
      (args: Seq[Expression]) => GeohashExpr(args(0), args(1), args(2))),
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double> vectors"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
    ("vec_cosine",
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two array<double> vectors"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))),
    ("simhash64",
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string> of tokens"),
      (args: Seq[Expression]) => SimHash64Expr(args(0))),
    ("graft_tokenize",
      info("graft_tokenize", "graft_tokenize(text) - lowercase alphanumeric tokens"),
      (args: Seq[Expression]) => TokenizeExpr(args(0))),
    ("graft_shingles",
      info("graft_shingles", "graft_shingles(text, k) - distinct hashed k-word shingles"),
      (args: Seq[Expression]) => ShingleHashesExpr(args(0), args(1))),
    ("graft_minhash",
      info("graft_minhash", "graft_minhash(shingles, n) - n-element MinHash signature"),
      (args: Seq[Expression]) => MinHashSigExpr(args(0), args(1))),
    ("graft_jaccard_sorted",
      info("graft_jaccard_sorted", "graft_jaccard_sorted(a, b) - exact jaccard of sorted arrays"),
      (args: Seq[Expression]) => JaccardSortedExpr(args(0), args(1))),
    ("graft_count_in_set",
      info("graft_count_in_set", "graft_count_in_set(tokens, set) - elements of tokens present in set"),
      (args: Seq[Expression]) => CountInSetExpr(args(0), args(1))),
    ("vec_avg",
      info("vec_avg", "vec_avg(v) - aggregate: element-wise mean of array<double> vectors"),
      (args: Seq[Expression]) => VectorAvg(args(0))),
    ("vec_sum",
      info("vec_sum", "vec_sum(v) - sum of an array<double> vector's elements"),
      (args: Seq[Expression]) => VecSumExpr(args(0))),
    ("graft_language_id",
      info("graft_language_id",
        "graft_language_id(text) - n-gram-profile language guess ('und' below threshold)"),
      (args: Seq[Expression]) => LanguageIdExpr(args(0),
        graft.ops.TextAnalysis.languageProfiles.toSeq, 0.05)),
    ("graft_winnow",
      info("graft_winnow",
        "graft_winnow(text, k, w) - sorted distinct winnowed k-gram fingerprints (window w)"),
      (args: Seq[Expression]) => WinnowExpr(args(0), litInt(args(1)), litInt(args(2)))),
    ("graft_gram_hashes",
      info("graft_gram_hashes",
        "graft_gram_hashes(text, k) - sorted distinct portable (md5-based) k-gram hashes"),
      (args: Seq[Expression]) => GramHashesExpr(args(0), litInt(args(1)))),
    ("graft_nfc_clean",
      info("graft_nfc_clean",
        "graft_nfc_clean(text) - unicode NFC normalization with control characters stripped"),
      (args: Seq[Expression]) => NfcCleanExpr(args(0))),
    ("graft_deflate_len",
      info("graft_deflate_len",
        "graft_deflate_len(text) - deflate-compressed byte length (compression-ratio quality signal)"),
      (args: Seq[Expression]) => DeflateLenExpr(args(0))),
    ("damerau_levenshtein",
      info("damerau_levenshtein",
        "damerau_levenshtein(a, b) - full (unrestricted) Damerau-Levenshtein edit distance"),
      (args: Seq[Expression]) => DamerauLevenshteinExpr(args(0), args(1))),
  )

  /** Constant-int argument of a registered function (k, w, …): these size
    * kernel buffers at plan time, so a non-foldable argument is a usage
    * error worth a clear message.
    */
  private def litInt(e: Expression): Int = {
    require(e.foldable, s"expected a literal integer argument, got: ${e.sql}")
    e.eval(null).asInstanceOf[Number].intValue()
  }

  /** Register on an already-built session (the extensions path only works at
    * session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), fnInfo, builder)
    }
}
