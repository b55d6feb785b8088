package graft.query

/** ES `simple_query_string` — the NEVER-THROWS sibling of
  * [[QueryString]]: end users type into it directly (ES recommends it
  * for exactly that), so malformed syntax DEGRADES to literal text
  * instead of erroring. The reference's search bar feeds user text
  * straight into a query string (`services/webapp/src/js/views.js:61`,
  * the Kibana search input) — this is the grammar ES built for that
  * trust level.
  *
  * Supported operators (each behind its ES flag, ALL on by default):
  * `+` AND, `|` OR, `-` NOT (prefix), `"…"` PHRASE, trailing-`*` PREFIX,
  * `(…)` PRECEDENCE, `~N` FUZZY after a term / SLOP after a phrase.
  * Whitespace between clauses applies `defaultOperator` (ES default OR).
  * `\` escapes the next character. A DISABLED flag's character is
  * ordinary text — `flags = Set("OR","NOT")` leaves `+` inside terms.
  *
  * Pinned degradation rules (ES documents "discards invalid parts"
  * without enumerating; these are this engine's written contract, each
  * spec-pinned):
  *  - an unterminated `"` runs the phrase to end of input;
  *  - an unmatched `)` is dropped as structure; an unmatched `(` opens a
  *    group that ends at end of input;
  *  - a dangling operator (`+`/`|`/`-` with no clause after, or
  *    leading `+`/`|`) is dropped;
  *  - an empty group `()` is dropped;
  *  - a term whose analysis is empty (pure punctuation) is dropped;
  *  - a `~` with no digits after it is literal text;
  *  - if EVERYTHING drops, the query is match_all — never an error.
  *
  * Precedence: there is NONE — Lucene's SimpleQueryParser
  * (`buildQueryTree`) folds clauses strictly LEFT-TO-RIGHT: each new
  * clause combines with everything parsed so far under the operator
  * before it (explicit `+`/`|`, else the default), starting a new group
  * only when the operator CHANGES. So `a | b c` under default AND is
  * `(a OR b) AND c`, and `a b | c` is `(a AND b) OR c` — the left fold,
  * not an AND-binds-tighter grammar. `-` negates the single clause after
  * it, which then folds like any other clause (Lucene wraps the branch
  * as MUST_NOT + a MatchAll SHOULD — a self-contained complement): `fox
  * -slow` under default OR is `fox OR NOT slow` (the documented ES
  * gotcha — negation under default OR is nearly unconstraining), under
  * default AND `fox AND NOT slow`; a query of ONLY negations matches
  * the complement, ES's own behavior for `-foo`.
  * Fuzzy terms ride [[FilterSpec.FuzzyTerm]] with Lucene's fuzzy
  * defaults (transpositions on); maxEdits clamps to 2, the Lucene bound
  * — a `~7` degrades to `~2` rather than erroring, the lenient path's
  * version of the strict parser's reject.
  */
object SimpleQueryString {

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AndOp extends Tok
  private case object OrOp extends Tok
  private case object NotOp extends Tok
  private final case class TermTok(text: String, prefix: Boolean, fuzzy: Option[Int]) extends Tok
  private final case class PhraseTok(text: String, slop: Option[Int]) extends Tok

  val AllFlags: Set[String] =
    Set("AND", "OR", "NOT", "PHRASE", "PREFIX", "PRECEDENCE", "FUZZY", "SLOP")

  /** Parse `q` against `defaultField`; never throws on `q`'s content. */
  def parse(
      q: String,
      defaultField: String,
      defaultOperator: String = "or",
      flags: Set[String] = AllFlags): FilterSpec =
    parseFields(q, Seq(defaultField), defaultOperator, flags)

  /** The multi-field form — ES's `fields: ["title", "body"]`: each text
    * clause (term/prefix/fuzzy/phrase) matches if it matches ANY of the
    * fields (Lucene SimpleQueryParser's `newDefaultQuery` — a SHOULD
    * clause per field), and the boolean structure is per-CLAUSE, not
    * per-field. Field boosts are scoring-only and deliberately absent
    * here (the [[QueryString]] filter-path precedent: a boost honored in
    * a filter compilation is a silent no-op that looks honored) — the
    * scoring path is [[graft.query.Bm25.multiMatchWeightedTopK]].
    */
  def parseFields(
      q: String,
      fields: Seq[String],
      defaultOperator: String = "or",
      flags: Set[String] = AllFlags): FilterSpec = {
    require(fields.nonEmpty, "simple_query_string: no fields")
    require(Seq("or", "and").contains(defaultOperator.toLowerCase),
      s"simple_query_string: default_operator must be or/and, got '$defaultOperator'")
    require(flags.subsetOf(AllFlags),
      s"simple_query_string: unknown flags ${(flags -- AllFlags).mkString(",")}")
    val toks = tokenize(q, flags)
    val (spec, _) = parseOr(toks, 0, fields,
      defaultOperator.equalsIgnoreCase("and"), flags, stopAtRp = false)
    spec.getOrElse(FilterSpec.MatchAll)
  }

  // ----- scanner (flag-aware; disabled operators are term characters) -----

  private def tokenize(q: String, flags: Set[String]): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def flag(f: String): Boolean = flags.contains(f)
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(' && flag("PRECEDENCE")) { out += LP; i += 1 }
      else if (c == ')' && flag("PRECEDENCE")) { out += RP; i += 1 }
      else if (c == '+' && flag("AND")) { out += AndOp; i += 1 }
      else if (c == '|' && flag("OR")) { out += OrOp; i += 1 }
      else if (c == '-' && flag("NOT")) { out += NotOp; i += 1 }
      else if (c == '"' && flag("PHRASE")) {
        i += 1
        val sb = new StringBuilder
        while (i < q.length && q(i) != '"') {
          if (q(i) == '\\' && i + 1 < q.length) { sb += q(i + 1); i += 2 }
          else { sb += q(i); i += 1 }
        }
        if (i < q.length) i += 1 // closing quote; unterminated runs to end
        // optional ~N slop
        val slop =
          if (flag("SLOP") && i < q.length && q(i) == '~') {
            val ds = q.drop(i + 1).takeWhile(_.isDigit)
            if (ds.nonEmpty) { i += 1 + ds.length; Some(ds.toInt) } else None
          } else None
        out += PhraseTok(sb.result(), slop)
      } else {
        // a term runs until whitespace or an ENABLED structural char
        val sb = new StringBuilder
        var done = false
        while (i < q.length && !done) {
          val ch = q(i)
          if (ch == '\\' && i + 1 < q.length) { sb += q(i + 1); i += 2 }
          else if (ch.isWhitespace ||
            (ch == '(' && flag("PRECEDENCE")) || (ch == ')' && flag("PRECEDENCE")) ||
            (ch == '+' && flag("AND")) || (ch == '|' && flag("OR")) ||
            (ch == '"' && flag("PHRASE")) ||
            (ch == '~' && flag("FUZZY"))) done = true
          else { sb += ch; i += 1 }
        }
        var text = sb.result()
        var fuzzy: Option[Int] = None
        if (i < q.length && q(i) == '~' && flag("FUZZY")) {
          val ds = q.drop(i + 1).takeWhile(_.isDigit)
          if (ds.nonEmpty) { i += 1 + ds.length; fuzzy = Some(math.min(ds.toInt, 2)) }
          else { text += "~"; i += 1 } // a bare ~ is literal text
        }
        val prefix = flag("PREFIX") && fuzzy.isEmpty && text.endsWith("*") &&
          !text.endsWith("\\*")
        val cleaned = if (prefix) text.dropRight(1) else text
        if (cleaned.nonEmpty) out += TermTok(cleaned, prefix, fuzzy)
      }
    }
    out.result()
  }

  // ----- tolerant recursive descent -----
  // One pass per nesting level: clauses folded strictly left-to-right
  // under the operator before each (Lucene SimpleQueryParser's
  // buildQueryTree — a new group only when the operator changes, which
  // a binary left fold reproduces exactly: same-operator runs flatten
  // to the same boolean). Every malformed shape drops instead of
  // throwing.

  private def parseOr(
      toks: Vector[Tok], start: Int, fields: Seq[String], defaultAnd: Boolean,
      flags: Set[String], stopAtRp: Boolean): (Option[FilterSpec], Int) = {
    var pos = start
    var top: Option[FilterSpec] = None
    var pendingOp: Option[Char] = None
    var done = false
    while (!done) {
      if (pos >= toks.length || (stopAtRp && toks(pos) == RP)) done = true
      else toks(pos) match {
        case OrOp => pendingOp = Some('|'); pos += 1
        case AndOp => pendingOp = Some('&'); pos += 1
        case _ =>
          val (clause, next) = parseClause(toks, pos, fields, defaultAnd, flags)
          pos = next
          clause.foreach { case (s0, neg) =>
            // a negated clause is a self-contained complement (Lucene's
            // MUST_NOT + MatchAll-SHOULD wrap) folded like any clause
            val s = if (neg) FilterSpec.Not(s0) else s0
            val op = pendingOp.getOrElse(if (defaultAnd) '&' else '|')
            top = Some(top match {
              case None => s
              case Some(t) =>
                if (op == '&') FilterSpec.And(Seq(t, s))
                else FilterSpec.Or(Seq(t, s))
            })
          }
          pendingOp = None // a dropped clause also clears the operator
      }
    }
    (top, pos)
  }

  /** One clause: `-`-negation, a `(…)` group, a term, or a phrase —
    * returned with its negation FLAG so the boolean level can give `-`
    * Lucene's MUST_NOT meaning. A `--a` double negation cancels. Drops
    * (None) for unmatched `)`, empty groups, unanalyzable terms, and
    * negation with nothing to negate. Text clauses expand over the
    * fields (match in ANY — the SHOULD-per-field rule).
    */
  private def parseClause(
      toks: Vector[Tok], start: Int, fields: Seq[String], defaultAnd: Boolean,
      flags: Set[String]): (Option[(FilterSpec, Boolean)], Int) = {
    if (start >= toks.length) return (None, start)
    def overFields(one: String => FilterSpec): FilterSpec = {
      val per = fields.map(one)
      if (per.size == 1) per.head else FilterSpec.Or(per)
    }
    toks(start) match {
      case NotOp =>
        val (inner, next) = parseClause(toks, start + 1, fields, defaultAnd, flags)
        (inner.map { case (s, neg) => (s, !neg) }, next)
      case LP =>
        val (inner, next) = parseOr(toks, start + 1, fields, defaultAnd, flags, stopAtRp = true)
        val consumed = if (next < toks.length && toks(next) == RP) next + 1 else next
        (inner.map((_, false)), consumed)
      case RP => (None, start + 1) // unmatched ) drops as structure
      case AndOp | OrOp => (None, start) // caller consumes operators
      case TermTok(text, prefix, fuzzy) =>
        val terms = graft.expr.TextMatch.analyze(text)
        val spec =
          if (terms.isEmpty) None
          else if (fuzzy.exists(_ > 0) && terms.size == 1)
            Some(overFields(f => FilterSpec.FuzzyTerm(f, terms.head, fuzzy.get,
              transpositions = true)))
          else if (prefix && fuzzy.isEmpty)
            Some(overFields(f =>
              if (terms.size == 1) FilterSpec.AnalyzedPrefix(f, terms.head)
              else FilterSpec.And(
                terms.init.map(t => FilterSpec.TermMatch(f, t): FilterSpec) :+
                  FilterSpec.AnalyzedPrefix(f, terms.last))))
          else Some(overFields(f => conj(terms.map(t => FilterSpec.TermMatch(f, t)))))
        (spec.map((_, false)), start + 1)
      case PhraseTok(text, slop) =>
        val terms = graft.expr.TextMatch.analyze(text)
        val spec =
          if (terms.isEmpty) None
          else slop match {
            case Some(s) if s > 0 =>
              Some(overFields(f => FilterSpec.PhraseSlop(f, text, s)))
            case _ => Some(overFields(f => FilterSpec.Phrase(f, text)))
          }
        (spec.map((_, false)), start + 1)
    }
  }

  private def conj(specs: Seq[FilterSpec]): FilterSpec =
    if (specs.size == 1) specs.head else FilterSpec.And(specs)
}
