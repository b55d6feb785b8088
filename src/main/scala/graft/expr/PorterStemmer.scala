package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Snowball English stemmer ("Porter2", M.F. Porter — the published
  * public algorithm at snowballstem.org; also Lucene's `english` stemmer,
  * which is what ES's `english` analyzer applies). Implemented directly
  * from the algorithm text: R1/R2 regions (with the gener-/commun-/arsen-
  * prefix exception), the y→Y consonant marking, steps 0-5, the
  * exceptional word lists, and the short-syllable rule.
  *
  * Deterministic, allocation-light, ASCII-lowercase input expected (the
  * [[TextMatch]] analyzers lowercase before stemming). Certified in
  * PorterStemmerSpec against hand-derived vectors from the published
  * algorithm, and hash-gated end-to-end by the `text_stems` oracle (the
  * oracle side is an INDEPENDENTLY hand-derived lookup — ground truth,
  * not an engine echo).
  */
object PorterStemmer {

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private val Doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val ValidLi = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')

  private val Exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val Exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  /** `w` with the y's that FUNCTION as consonants marked 'Y' (initial y,
    * or y after a vowel).
    */
  private def markYs(w: String): String = {
    val sb = new StringBuilder(w)
    var i = 0
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && (i == 0 || isVowel(sb.charAt(i - 1))))
        sb.setCharAt(i, 'Y')
      i += 1
    }
    sb.result()
  }

  /** Index where R1 starts: after the first non-vowel following a vowel
    * (or the word end), with the gener-/commun-/arsen- prefix exception.
    */
  private def r1Of(w: String): Int = {
    if (w.startsWith("gener")) return 5
    if (w.startsWith("commun")) return 6
    if (w.startsWith("arsen")) return 5
    regionAfterVc(w, 0)
  }

  private def regionAfterVc(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w.charAt(i))) i += 1
    while (i < w.length && isVowel(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** The word ends in a short syllable: vowel + non-vowel(≠ w,x,Y)
    * preceded by a non-vowel, at the end; or the whole word is
    * vowel + non-vowel.
    */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w.charAt(0)) && !isVowel(w.charAt(1))
    else if (n >= 3) {
      val c = w.charAt(n - 1)
      isVowel(w.charAt(n - 2)) && !isVowel(w.charAt(n - 3)) &&
        !isVowel(c) && c != 'w' && c != 'x' && c != 'Y'
    } else false
  }

  private def containsVowel(w: String, until: Int): Boolean = {
    var i = 0
    while (i < until) { if (isVowel(w.charAt(i))) return true; i += 1 }
    false
  }

  /** Stem one lowercase token. Non-letters pass through untouched (the
    * analyzer only feeds [a-z0-9]+ tokens; digit-bearing tokens are left
    * as-is — stemming is a letters-only notion).
    */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    if (word.exists(c => c < 'a' || c > 'z')) return word
    Exceptions1.get(word) match {
      case Some(s) => return s
      case None =>
    }
    var w = markYs(if (word.startsWith("'")) word.substring(1) else word)
    var r1 = r1Of(w)
    var r2 = regionAfterVc(w, r1)
    def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2

    // Step 0: 's' / 's / '
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") && containsVowel(w, w.length - 2)) w = w.dropRight(1)

    if (Exceptions2.contains(w)) return w

    // Step 1b
    if (w.endsWith("eedly")) { if (inR1(5)) w = w.dropRight(3) }
    else if (w.endsWith("eed")) { if (inR1(3)) w = w.dropRight(1) }
    else {
      val suf =
        if (w.endsWith("ingly")) 5
        else if (w.endsWith("edly")) 4
        else if (w.endsWith("ing")) 3
        else if (w.endsWith("ed")) 2
        else 0
      if (suf > 0 && containsVowel(w, w.length - suf)) {
        w = w.dropRight(suf)
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (w.length >= 2 && Doubles.contains(w.substring(w.length - 2)))
          w = w.dropRight(1)
        else {
          // recompute R1 on the shortened word for the short-word test
          val r1b = r1Of(w)
          if (r1b >= w.length && endsShortSyllable(w)) w += "e"
        }
      }
    }
    r1 = r1Of(w); r2 = regionAfterVc(w, r1)

    // Step 1c: y/Y → i after a non-vowel that is not the first letter
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
        !isVowel(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // Step 2 (longest suffix, in R1)
    val step2: Seq[(String, String => String)] = Seq(
      "ization" -> (s => s.dropRight(7) + "ize"),
      "ational" -> (s => s.dropRight(7) + "ate"),
      "fulness" -> (s => s.dropRight(4)),
      "ousness" -> (s => s.dropRight(4)),
      "iveness" -> (s => s.dropRight(4)),
      "tional" -> (s => s.dropRight(2)),
      "biliti" -> (s => s.dropRight(6) + "ble"),
      "lessli" -> (s => s.dropRight(2)),
      "entli" -> (s => s.dropRight(2)),
      "ation" -> (s => s.dropRight(5) + "ate"),
      "alism" -> (s => s.dropRight(3)),
      "aliti" -> (s => s.dropRight(3)),
      "ousli" -> (s => s.dropRight(2)),
      "iviti" -> (s => s.dropRight(5) + "ive"),
      "fulli" -> (s => s.dropRight(2)),
      "enci" -> (s => s.dropRight(1) + "e"),
      "anci" -> (s => s.dropRight(1) + "e"),
      "abli" -> (s => s.dropRight(1) + "e"),
      "izer" -> (s => s.dropRight(1)),
      "ator" -> (s => s.dropRight(2) + "e"),
      "alli" -> (s => s.dropRight(2)),
      "bli" -> (s => s.dropRight(1) + "e"),
      "ogi" -> (s => if (s.length >= 4 && s.charAt(s.length - 4) == 'l') s.dropRight(1) else s),
      "li" -> (s => if (s.length >= 3 && ValidLi.contains(s.charAt(s.length - 3))) s.dropRight(2) else s))
    step2.find { case (suf, _) => w.endsWith(suf) } match {
      case Some((suf, f)) if inR1(suf.length) => w = f(w)
      case _ =>
    }
    r1 = r1Of(w); r2 = regionAfterVc(w, r1)

    // Step 3 (in R1; ative needs R2)
    val step3: Seq[(String, String => String)] = Seq(
      "ational" -> (s => s.dropRight(7) + "ate"),
      "tional" -> (s => s.dropRight(2)),
      "alize" -> (s => s.dropRight(3)),
      "icate" -> (s => s.dropRight(3)),
      "iciti" -> (s => s.dropRight(3)),
      "ative" -> identity, // handled below (R2)
      "ical" -> (s => s.dropRight(2)),
      "ness" -> (s => s.dropRight(4)),
      "ful" -> (s => s.dropRight(3)))
    step3.find { case (suf, _) => w.endsWith(suf) } match {
      case Some(("ative", _)) if inR2(5) => w = w.dropRight(5)
      case Some(("ative", _)) => ()
      case Some((suf, f)) if inR1(suf.length) => w = f(w)
      case _ =>
    }
    r1 = r1Of(w); r2 = regionAfterVc(w, r1)

    // Step 4 (in R2); ion only after s/t
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic")
    step4.find(w.endsWith) match {
      case Some("ion") =>
        if (inR2(3) && w.length >= 4 &&
            (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
          w = w.dropRight(3)
      case Some(suf) if inR2(suf.length) => w = w.dropRight(suf.length)
      case _ =>
    }
    r1 = r1Of(w); r2 = regionAfterVc(w, r1)

    // Step 5
    if (w.endsWith("e") &&
        (inR2(1) || (inR1(1) && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && inR2(1) && w.length >= 2 && w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }
}

/** `porter2(token)` as a Catalyst expression — interpreted eval (the
  * analyzed-column path runs at INDEX time; per-token stemming is an
  * index-build cost, not a per-query one).
  */
case class PorterStemExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PorterStemmer.stem(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.expr.PorterStemmer.stem($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): PorterStemExpr =
    copy(child = newChild)
}

object PorterStem {
  def apply(c: Column): Column = ColumnShim.column(PorterStemExpr(ColumnShim.expression(c)))
}
