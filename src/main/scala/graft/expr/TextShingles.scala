package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize → shingle → MinHash kernels.
  *
  * The `Column`-algebra formulation (`filter(split(lower(c), ...))` +
  * nested `transform(sequence(...), xxhash64(...))`) routes every element
  * through Catalyst's interpreted higher-order-function path —
  * `ArrayFilter.nullSafeEval` dominated dedup profiles (hundreds of CPU-
  * seconds per partition at sf0.1). These expressions do the same work in
  * tight loops invoked inline from whole-stage codegen.
  *
  * Hash compatibility: shingle hashes equal SQL
  * `xxhash64(concat_ws(' ', shingle_tokens))` bit-for-bit (XXH64 over UTF-8
  * bytes, seed 42). Signature re-hashes use the composition
  * XXH64(s, XXH64(i, 42)) — deterministic and seeded, not value-compatible
  * with SQL `xxhash64(i, s)` (which hashes the index as a 4-byte int).
  */
object TextShingleAlgo {
  final val Seed = 42L

  /** Lowercase alphanumeric tokens — semantics of
    * `filter(split(lower(c), "[^a-z0-9]+"), length > 0)`: maximal runs of
    * `[a-z0-9]` after lowercasing; everything else separates.
    */
  def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString.toLowerCase
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    val n = s.length
    var i = 0
    var start = -1
    while (i < n) {
      val c = s.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) { out += s.substring(start, i); start = -1 }
      i += 1
    }
    if (start >= 0) out += s.substring(start, n)
    out.toArray
  }

  def tokenizeArrayData(text: UTF8String): ArrayData =
    new GenericArrayData(tokenize(text).map(t => UTF8String.fromString(t): AnyRef))

  /** Distinct hashed k-token shingles, first-seen order; empty when fewer
    * than `k` tokens. Hash = XXH64(UTF-8 of "tok1 tok2 … tokk", seed 42).
    */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < k) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(XXH64.hashUTF8String(UTF8String.fromString(sb.toString), Seed))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Distinct k-token shingles as STRINGS ("tok1 tok2 … tokk"), first-seen
    * order; empty when fewer than `k` tokens. The string form exists for
    * cross-engine joins (benchmark decontamination's oracle restates it in
    * SQL verbatim); [[shingleHashes]] is the bandwidth-optimal variant when
    * both sides live in this engine.
    */
  def shingleStrings(text: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < k) return new GenericArrayData(Array.empty[AnyRef])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** Exact Jaccard of two SORTED long arrays via a single merge pass —
    * no per-pair hash-set allocation (`array_intersect`'s interpreted eval
    * dominated candidate verification at |candidates| ~ millions).
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c.toDouble / (na + nb - c).toDouble
  }

  /** One hash probe per token against a (typically tiny) reference set. */
  def countInSet(tokens: ArrayData, set: ArrayData): Int = {
    val s = new java.util.HashSet[UTF8String](set.numElements() * 2)
    var i = 0
    val ns = set.numElements()
    while (i < ns) { if (!set.isNullAt(i)) s.add(set.getUTF8String(i)); i += 1 }
    var c = 0
    var j = 0
    val nt = tokens.numElements()
    while (j < nt) {
      if (!tokens.isNullAt(j) && s.contains(tokens.getUTF8String(j))) c += 1
      j += 1
    }
    c
  }

  /** MinHash signature: `numHashes` independent minimums of seeded re-hashes
    * of the shingle set. Re-hash of shingle `s` under function `i` is
    * XXH64(s, XXH64(i, 42)) — Spark's `xxhash64(i, s)` composition.
    */
  def minhashSignature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val seedI = XXH64.hashLong(i.toLong, Seed)
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = XXH64.hashLong(shingles.getLong(j), seedI)
        if (h < best) best = h
        j += 1
      }
      out(i) = if (n == 0) 0L else best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Count of array elements contained in a small reference set — the kernel
  * behind stopword ratios and function-word language scoring
  * (`size(filter(toks, t => array_contains(set, t)))` walks both arrays
  * through the interpreted HOF path; this is one hash probe per token).
  * Duplicate tokens count every occurrence, matching the HOF semantics.
  */
case class CountInSetExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_count_in_set"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override protected def nullSafeEval(tokens: Any, set: Any): Any =
    TextShingleAlgo.countInSet(tokens.asInstanceOf[ArrayData], set.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) => s"graft.expr.TextShingleAlgo.countInSet($t, $s)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountInSetExpr =
    copy(left = l, right = r)
}

/** `text → array<string>` lowercase alphanumeric tokens (codegen'd). */
case class TokenizeExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_tokenize"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(text: Any): Any =
    TextShingleAlgo.tokenizeArrayData(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.TextShingleAlgo.tokenizeArrayData($t)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

/** `text → array<long>` distinct hashed k-shingles (codegen'd). */
case class ShingleHashesExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(text: Any, k: Any): Any =
    TextShingleAlgo.shingleHashes(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.expr.TextShingleAlgo.shingleHashes($t, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleHashesExpr =
    copy(left = l, right = r)
}

/** `text → array<string>` distinct k-shingle strings (codegen'd). */
case class ShingleStringsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_shingle_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(text: Any, k: Any): Any =
    TextShingleAlgo.shingleStrings(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.expr.TextShingleAlgo.shingleStrings($t, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleStringsExpr =
    copy(left = l, right = r)
}

/** Exact Jaccard of two SORTED `array<long>` columns (codegen'd merge). */
case class JaccardSortedExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_jaccard_sorted"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextShingleAlgo.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.TextShingleAlgo.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedExpr =
    copy(left = l, right = r)
}

/** `array<long> shingles → array<long>` MinHash signature (codegen'd). */
case class MinHashSigExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(shingles: Any, numHashes: Any): Any =
    TextShingleAlgo.minhashSignature(
      shingles.asInstanceOf[ArrayData], numHashes.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.expr.TextShingleAlgo.minhashSignature($s, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSigExpr =
    copy(left = l, right = r)
}

object TextShingles {
  import org.apache.spark.sql.functions.lit

  def tokenize(text: Column): Column =
    ColumnShim.column(TokenizeExpr(ColumnShim.expression(text)))

  def shingleHashes(text: Column, k: Int): Column =
    ColumnShim.column(ShingleHashesExpr(
      ColumnShim.expression(text), ColumnShim.expression(lit(k))))

  def shingleStrings(text: Column, k: Int): Column =
    ColumnShim.column(ShingleStringsExpr(
      ColumnShim.expression(text), ColumnShim.expression(lit(k))))

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnShim.column(MinHashSigExpr(
      ColumnShim.expression(shingles), ColumnShim.expression(lit(numHashes))))

  /** Exact Jaccard of two sorted `array<long>` columns. */
  def jaccardSorted(a: Column, b: Column): Column =
    ColumnShim.column(JaccardSortedExpr(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Count of `tokens` elements present in `set` (duplicates count). */
  def countInSet(tokens: Column, set: Column): Column =
    ColumnShim.column(CountInSetExpr(
      ColumnShim.expression(tokens), ColumnShim.expression(set)))
}
