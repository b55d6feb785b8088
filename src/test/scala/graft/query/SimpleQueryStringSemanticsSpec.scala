package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

/** Adversarial semantic certification of [[SimpleQueryString]] — the
  * [[ProximitySemanticsSpec]] method: an INDEPENDENT brute-force
  * interpreter of the written contract (scaladoc grammar + degradation
  * rules + Lucene BooleanQuery resolution), written directly against
  * doc token sequences with none of the engine's FilterSpec machinery,
  * compared doc-for-doc against the compiled predicate over seeded
  * random corpora and seeded random (frequently malformed) queries.
  * Zero disagreements is the bar.
  *
  * The generator deliberately produces broken syntax — dangling
  * operators, stray parens, unterminated quotes — because the
  * never-throws degradation rules ARE the contract under test.
  */
class SimpleQueryStringSemanticsSpec extends SparkSpecBase {
  import spark.implicits._

  // ----- independent interpreter (no FilterSpec, no SimpleQueryString) --

  private sealed trait Node
  private case class Term(t: String) extends Node
  private case class Prefix(p: String) extends Node
  private case class Phrase(ts: Seq[String]) extends Node
  private case class Group(n: Option[Node]) extends Node
  private case class Negated(n: Node) extends Node

  /** Evaluate one positive node against a doc's FIELDS (each a token
    * sequence) — a text node matches if ANY field matches, the
    * SHOULD-per-field multi-field rule; single-field docs are the
    * one-element case.
    */
  private def evalNode(n: Node, doc: Seq[Vector[String]]): Boolean = n match {
    case Term(t) => doc.exists(_.contains(t))
    case Prefix(p) => doc.exists(_.exists(_.startsWith(p)))
    case Phrase(ts) => doc.exists(_.sliding(ts.length).exists(_ == ts))
    case Group(inner) => inner.exists(evalNode(_, doc))
    case Negated(inner) => !evalNode(inner, doc)
  }

  /** Interpret the query text directly: scan tokens, then fold clauses
    * strictly left-to-right under the operator before each — Lucene
    * SimpleQueryParser's buildQueryTree rule (no precedence; a negated
    * clause is its complement folded like any other). Mirrors the
    * written contract, not the implementation.
    */
  private def interpret(q: String, doc: Seq[Vector[String]], defaultAnd: Boolean): Boolean =
    level(scan(q), 0, doc, defaultAnd, stopAtRp = false)._1.getOrElse(true)

  private sealed trait T
  private case object TLp extends T
  private case object TRp extends T
  private case object TAnd extends T
  private case object TOr extends T
  private case object TNot extends T
  private case class TTerm(text: String, prefix: Boolean) extends T
  private case class TPhrase(ts: Seq[String]) extends T

  private def scan(q: String): Vector[T] = {
    val out = Vector.newBuilder[T]
    var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += TLp; i += 1 }
      else if (c == ')') { out += TRp; i += 1 }
      else if (c == '+') { out += TAnd; i += 1 }
      else if (c == '|') { out += TOr; i += 1 }
      else if (c == '-') { out += TNot; i += 1 }
      else if (c == '"') {
        i += 1
        val sb = new StringBuilder
        while (i < q.length && q(i) != '"') { sb += q(i); i += 1 }
        if (i < q.length) i += 1
        // the engine ANALYZES phrase text: punctuation-only tokens vanish
        out += TPhrase(sb.result().split("\\s+")
          .map(_.filter(_.isLetterOrDigit)).filter(_.nonEmpty).toSeq)
      } else {
        val sb = new StringBuilder
        while (i < q.length && !q(i).isWhitespace &&
          !"()+|\"".contains(q(i))) { sb += q(i); i += 1 }
        val text = sb.result()
        val prefix = text.endsWith("*")
        val cleaned = (if (prefix) text.dropRight(1) else text)
          .filter(_.isLetterOrDigit) // term analysis on the clean vocab
        if (cleaned.nonEmpty) out += TTerm(cleaned, prefix)
      }
    }
    out.result()
  }

  /** One boolean level: (matched-if-any-content, next position). */
  private def level(toks: Vector[T], start: Int, doc: Seq[Vector[String]],
      defaultAnd: Boolean, stopAtRp: Boolean): (Option[Boolean], Int) = {
    var pos = start
    var top: Option[Boolean] = None
    var pending: Option[Char] = None
    var done = false
    while (!done) {
      if (pos >= toks.length || (stopAtRp && toks(pos) == TRp)) done = true
      else toks(pos) match {
        case TOr => pending = Some('|'); pos += 1
        case TAnd => pending = Some('&'); pos += 1
        case _ =>
          val (clause, next) = clauseAt(toks, pos, doc, defaultAnd)
          pos = next
          clause.foreach { case (v0, neg) =>
            val v = if (neg) !v0 else v0
            val op = pending.getOrElse(if (defaultAnd) '&' else '|')
            top = Some(top match {
              case None => v
              case Some(t) => if (op == '&') t && v else t || v
            })
          }
          pending = None
      }
    }
    (top, pos)
  }

  private def clauseAt(toks: Vector[T], start: Int, doc: Seq[Vector[String]],
      defaultAnd: Boolean): (Option[(Boolean, Boolean)], Int) = {
    if (start >= toks.length) return (None, start)
    toks(start) match {
      case TNot =>
        val (inner, next) = clauseAt(toks, start + 1, doc, defaultAnd)
        (inner.map { case (v, neg) => (v, !neg) }, next)
      case TLp =>
        val (inner, next) = level(toks, start + 1, doc, defaultAnd, stopAtRp = true)
        val consumed = if (next < toks.length && toks(next) == TRp) next + 1 else next
        (inner.map((_, false)), consumed)
      case TRp => (None, start + 1)
      case TAnd | TOr => (None, start)
      case TTerm(t, prefix) =>
        val v = if (prefix) evalNode(Prefix(t), doc) else evalNode(Term(t), doc)
        (Some((v, false)), start + 1)
      case TPhrase(ts) =>
        if (ts.isEmpty) (None, start + 1)
        else (Some((evalNode(Phrase(ts), doc), false)), start + 1)
    }
  }

  // ----- the comparison -----

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel")

  test("compiled predicate ≡ independent interpreter over 80 seeded random queries × 200 docs") {
    val rnd = new scala.util.Random(1717)
    val docs = (1L to 200L).map { id =>
      val n = 3 + rnd.nextInt(6)
      (id, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("id", "text")
    df.cache().count()

    def genQuery(): String = {
      val parts = Seq.newBuilder[String]
      val nParts = 1 + rnd.nextInt(5)
      (0 until nParts).foreach { _ =>
        val roll = rnd.nextInt(12)
        val word = vocab(rnd.nextInt(vocab.size))
        val piece = roll match {
          case 0 | 1 | 2 | 3 => word
          case 4 => "-" + word
          case 5 => word.take(2 + rnd.nextInt(3)) + "*"
          case 6 => "\"" + word + " " + vocab(rnd.nextInt(vocab.size)) + "\""
          case 7 => "(" + word + " | " + vocab(rnd.nextInt(vocab.size)) + ")"
          case 8 => "+" + word
          case 9 => "|" // dangling operator on purpose
          case 10 => ")" // stray paren on purpose
          case 11 => "\"" + word // unterminated quote on purpose
        }
        parts += piece
      }
      parts.result().mkString(" ")
    }

    var disagreements = 0
    (1 to 80).foreach { qi =>
      val q = genQuery()
      Seq(false, true).foreach { defaultAnd =>
        val op = if (defaultAnd) "and" else "or"
        val spec = SimpleQueryString.parse(q, "text", op)
        val engine = df.where(spec.compile).select("id").as[Long].collect().toSet
        val expected = docs.filter { case (_, ts) =>
          interpret(q, Seq(ts), defaultAnd)
        }.map(_._1).toSet
        if (engine != expected) {
          disagreements += 1
          info(s"DISAGREE on <$q> (default $op): engine-only=" +
            s"${(engine -- expected).take(3)}, interp-only=${(expected -- engine).take(3)}")
        }
      }
    }
    assert(disagreements == 0, s"$disagreements disagreements — semantics diverged")
  }

  test("multi-field parseFields ≡ interpreter over 60 seeded random queries × 150 two-field docs") {
    val rnd = new scala.util.Random(4242)
    val docs = (1L to 150L).map { id =>
      def mk(n: Int) = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (id, mk(2 + rnd.nextInt(5)), mk(1 + rnd.nextInt(3)))
    }
    val df = docs.map { case (id, a, b) => (id, a.mkString(" "), b.mkString(" ")) }
      .toDF("id", "text", "tag")
    df.cache().count()

    def genQuery(): String = {
      val parts = Seq.newBuilder[String]
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        val word = vocab(rnd.nextInt(vocab.size))
        parts += (rnd.nextInt(7) match {
          case 0 | 1 | 2 => word
          case 3 => "-" + word
          case 4 => word.take(2 + rnd.nextInt(3)) + "*"
          case 5 => "\"" + word + " " + vocab(rnd.nextInt(vocab.size)) + "\""
          case 6 => "(" + word + " | " + vocab(rnd.nextInt(vocab.size)) + ")"
        })
      }
      parts.result().mkString(" ")
    }

    var disagreements = 0
    (1 to 60).foreach { _ =>
      val q = genQuery()
      Seq(false, true).foreach { defaultAnd =>
        val op = if (defaultAnd) "and" else "or"
        val spec = SimpleQueryString.parseFields(q, Seq("text", "tag"), op)
        val engine = df.where(spec.compile).select("id").as[Long].collect().toSet
        val expected = docs.filter { case (_, a, b) =>
          interpret(q, Seq(a, b), defaultAnd)
        }.map(_._1).toSet
        if (engine != expected) {
          disagreements += 1
          info(s"DISAGREE on <$q> (default $op, 2 fields): engine-only=" +
            s"${(engine -- expected).take(3)}, interp-only=${(expected -- engine).take(3)}")
        }
      }
    }
    assert(disagreements == 0, s"$disagreements disagreements — multi-field semantics diverged")
  }
}
