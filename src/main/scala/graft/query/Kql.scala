package graft.query

/** KQL — the Kibana Query Language — → [[FilterSpec]] compiler. KQL is
  * the search bar Kibana ships as its DEFAULT since 7.0 (the reference's
  * dashboards predate it and use Lucene `query_string`
  * (`notebooks/kibana-content/kibana-exported-visualizations.json`), but
  * every modern Kibana user types KQL), and ES|QL 8.16+ exposes it as
  * the `KQL("…")` function — the seam [[Esql]] compiles through here.
  *
  * Supported surface (the public KQL grammar):
  *
  *  - boolean keywords `and` / `or` / `not`, case-insensitive, with the
  *    usual precedence `not` > `and` > `or`; parentheses group.
  *  - `field:value` — analyzed match: an unquoted value runs ACROSS
  *    spaces until a keyword/structural character (kuery's
  *    UnquotedLiteral), and multiple analyzed terms mean ANY may appear
  *    (match's default OR — Kibana's documented `body:quick brown fox`
  *    in-any-order rule); `field:"a phrase"` — phrase; `field:val*` —
  *    trailing-star analyzed prefix; other `*` shapes — raw-field
  *    full-value wildcard (KQL's `*` is its only wildcard; no `?`);
  *    `field:*` — existence.
  *  - value groups: `field:(a or b)`, `field:(a and not b)` — the field
  *    distributes over the group.
  *  - range comparisons `field > v`, `>=`, `<`, `<=` (KQL's spelling of
  *    ranges — no `[a TO b]` brackets here) via [[FilterSpec.TermRange]]
  *    one-sided, numeric when the literal is numeric.
  *  - nested-query braces `path:{ a:v and b > 2 }` — ES's `nested`
  *    query over a [[NestedDocs.nest]]-built array<struct> column: every
  *    condition holds on the SAME element ([[FilterSpec.Nested]], one
  *    higher-order `exists`, no explode). One level (double nesting
  *    rejects); the body takes field:value atoms, phrases, trailing-star
  *    prefixes, `field:*` exists, ranges, value groups, and/or/not.
  *  - bare terms hit `defaultField` (Kibana resolves "default fields"
  *    from the index mapping; this engine has no mapping, so the caller
  *    supplies the field — absent + bare term = loud reject). A lone
  *    unescaped `*` is match_all.
  *  - `\`-escapes neutralize special characters (`\(`, `\:`, `\*`, …);
  *    quoted strings make keywords literal.
  *
  * Stated deltas from Lucene `query_string` (KQL's own documented
  * design): NO fuzzy `~`, NO boosts `^`, NO regex `/…/` — KQL dropped
  * them deliberately; they reject here as unknown syntax rather than
  * parsing silently. Unlike [[SimpleQueryString]], KQL is a STRICT
  * grammar — Kibana raises parse errors, and so does this compiler.
  */
object Kql {

  def parse(q: String, defaultField: Option[String]): FilterSpec = {
    val toks = tokenize(q)
    if (toks.isEmpty) FilterSpec.MatchAll
    else {
      val p = new Parser(toks, defaultField, q)
      val spec = p.orExpr()
      require(p.exhausted, s"kql: unexpected '${p.peekRaw}' after a complete query in <$q>")
      spec
    }
  }

  // ===== scanner =====

  private final case class EChar(c: Char, esc: Boolean)

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object LB extends Tok
  private case object RB extends Tok
  private case object Colon extends Tok
  private final case class RangeOp(op: String) extends Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok
  private final case class Quoted(text: String) extends Tok
  private final case class Word(chars: Vector[EChar]) extends Tok {
    def text: String = chars.map(_.c).mkString
    override def toString: String = text
  }

  private def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == '{') { out += LB; i += 1 }
      else if (c == '}') { out += RB; i += 1 }
      else if (c == ':') { out += Colon; i += 1 }
      else if (c == '<' || c == '>') {
        val op =
          if (i + 1 < q.length && q(i + 1) == '=') { i += 2; s"$c=" }
          else { i += 1; c.toString }
        out += RangeOp(op)
      } else if (c == '"') {
        i += 1
        val sb = new StringBuilder
        while (i < q.length && q(i) != '"') {
          if (q(i) == '\\' && i + 1 < q.length) { sb += q(i + 1); i += 2 }
          else { sb += q(i); i += 1 }
        }
        require(i < q.length, s"kql: unterminated quote in <$q>")
        i += 1
        out += Quoted(sb.result())
      } else {
        // A standalone unescaped and/or/not segment is an operator —
        // checked BEFORE literal scanning (the literal absorbs spaces
        // below, so the check could never fire afterwards).
        def segmentAt(from: Int): String = {
          var k = from
          val sb = new StringBuilder
          while (k < q.length && q(k) != '\\' && !q(k).isWhitespace &&
            "(){}:<>\"".indexOf(q(k)) < 0) { sb += q(k); k += 1 }
          sb.result()
        }
        val kw = segmentAt(i).toLowerCase
        if (Set("and", "or", "not").contains(kw)) {
          out += (kw match {
            case "and" => AndTok
            case "or" => OrTok
            case _ => NotTok
          })
          i += kw.length
        } else {
          // kuery's UnquotedLiteral: the literal runs ACROSS spaces until
          // a keyword, a structural character, or end of input — Kibana's
          // `body:quick brown fox` is ONE value (an analyzed match), not
          // three clauses. Operators between clauses are therefore
          // mandatory in KQL (its own rule).
          val chars = Vector.newBuilder[EChar]
          var done = false
          while (i < q.length && !done) {
            val ch = q(i)
            if (ch == '\\') {
              require(i + 1 < q.length, s"kql: dangling escape at end of <$q>")
              chars += EChar(q(i + 1), esc = true); i += 2
            } else if ("(){}:<>\"".indexOf(ch) >= 0) done = true
            else if (ch.isWhitespace) {
              var j = i
              while (j < q.length && q(j).isWhitespace) j += 1
              if (j >= q.length || "(){}:<>\"".indexOf(q(j)) >= 0) done = true
              else if (q(j) == '\\') { chars += EChar(' ', esc = false); i = j }
              else if (Set("and", "or", "not").contains(segmentAt(j).toLowerCase)) done = true
              else { chars += EChar(' ', esc = false); i = j }
            } else { chars += EChar(ch, esc = false); i += 1 }
          }
          out += Word(chars.result())
        }
      }
    }
    out.result()
  }

  // ===== recursive descent =====

  private final class Parser(toks: Vector[Tok], defaultField: Option[String], q: String) {
    private var pos = 0
    def exhausted: Boolean = pos >= toks.length
    def peekRaw: String = if (exhausted) "<end>" else toks(pos).toString
    private def peek: Option[Tok] = if (exhausted) None else Some(toks(pos))
    private def advance(): Tok = {
      require(!exhausted, s"kql: query ends where a clause is expected in <$q>")
      val t = toks(pos); pos += 1; t
    }

    def orExpr(): FilterSpec = {
      val parts = Seq.newBuilder[FilterSpec]
      parts += andExpr()
      while (peek.contains(OrTok)) { advance(); parts += andExpr() }
      conj(parts.result(), or = true)
    }

    private def andExpr(): FilterSpec = {
      val parts = Seq.newBuilder[FilterSpec]
      parts += notExpr()
      while (peek.contains(AndTok)) { advance(); parts += notExpr() }
      conj(parts.result(), or = false)
    }

    private def notExpr(): FilterSpec = peek match {
      case Some(NotTok) => advance(); FilterSpec.Not(notExpr())
      case _ => primary()
    }

    private def primary(): FilterSpec = advance() match {
      case LP =>
        val inner = orExpr()
        require(peek.contains(RP), s"kql: expected ')' but found $peekRaw in <$q>")
        advance()
        inner
      case w: Word =>
        peek match {
          case Some(Colon) =>
            advance()
            fieldedValue(w.text)
          case Some(RangeOp(op)) =>
            advance()
            rangeClause(w.text, op)
          case _ => bareValue(w)
        }
      case Quoted(text) =>
        // a bare quoted phrase against the default field
        FilterSpec.Phrase(requireDefault("a bare phrase"), text)
      case t => throw new IllegalArgumentException(
        s"kql: expected a clause but found '$t' in <$q>")
    }

    private def requireDefault(what: String): String =
      defaultField.getOrElse(throw new IllegalArgumentException(
        s"kql: $what needs the index's default field — none was supplied " +
          s"(the /esql route's default_field option) in <$q>"))

    private def bareValue(w: Word): FilterSpec = {
      val text = w.text
      if (text == "*" && !w.chars.head.esc) FilterSpec.MatchAll
      else valueAtomSpec(requireDefault(s"the bare term <$text>"), w)
    }

    /** After `field:` — a value group `(…)` distributes the field, else a
      * single value atom.
      */
    private def fieldedValue(field: String): FilterSpec = peek match {
      case Some(LP) =>
        advance()
        val inner = valueOr(field)
        require(peek.contains(RP), s"kql: expected ')' closing the value group but found $peekRaw in <$q>")
        advance()
        inner
      case Some(LB) =>
        // KQL nested-query braces: `path:{ a:1 and b > 2 }` — every
        // condition holds on the SAME element of the nested-doc array
        advance()
        val inner = nOr()
        require(peek.contains(RB), s"kql: expected '}' closing the nested group but found $peekRaw in <$q>")
        advance()
        FilterSpec.Nested(field, inner)
      case _ => valueAtom(field)
    }

    // ----- the nested-brace body: the boolean grammar over NestedCond -----

    import FilterSpec.NestedCond
    import FilterSpec.NestedCond._

    private def nConj(cs: Seq[NestedCond], or: Boolean): NestedCond =
      if (cs.size == 1) cs.head else if (or) NOr(cs) else NAnd(cs)

    private def nOr(): NestedCond = {
      val parts = Seq.newBuilder[NestedCond]
      parts += nAnd()
      while (peek.contains(OrTok)) { advance(); parts += nAnd() }
      nConj(parts.result(), or = true)
    }

    private def nAnd(): NestedCond = {
      val parts = Seq.newBuilder[NestedCond]
      parts += nNot()
      while (peek.contains(AndTok)) { advance(); parts += nNot() }
      nConj(parts.result(), or = false)
    }

    private def nNot(): NestedCond = peek match {
      case Some(NotTok) => advance(); NNot(nNot())
      case Some(LP) =>
        advance()
        val inner = nOr()
        require(peek.contains(RP), s"kql: expected ')' in the nested group but found $peekRaw in <$q>")
        advance()
        inner
      case _ => nPrimary()
    }

    private def nPrimary(): NestedCond = advance() match {
      case w: Word => peek match {
        case Some(Colon) =>
          advance()
          peek match {
            case Some(LB) => throw new IllegalArgumentException(
              "kql: nested braces do not nest — one level per query " +
                s"(double-nested mappings need the Scala NestedDocs API) in <$q>")
            case Some(LP) =>
              advance()
              val inner = nValueOr(w.text)
              require(peek.contains(RP),
                s"kql: expected ')' closing the nested value group but found $peekRaw in <$q>")
              advance()
              inner
            case _ => nValueAtom(w.text)
          }
        case Some(RangeOp(op)) =>
          advance()
          nRange(w.text, op)
        case _ => throw new IllegalArgumentException(
          s"kql: a nested clause needs field:value — bare term <${w.text}> has " +
            s"no default field inside a nested doc in <$q>")
      }
      case t => throw new IllegalArgumentException(
        s"kql: expected a nested clause but found '$t' in <$q>")
    }

    private def nValueOr(field: String): NestedCond = {
      val parts = Seq.newBuilder[NestedCond]
      parts += nValueAnd(field)
      while (peek.contains(OrTok)) { advance(); parts += nValueAnd(field) }
      nConj(parts.result(), or = true)
    }

    private def nValueAnd(field: String): NestedCond = {
      val parts = Seq.newBuilder[NestedCond]
      parts += nValueNot(field)
      while (peek.contains(AndTok)) { advance(); parts += nValueNot(field) }
      nConj(parts.result(), or = false)
    }

    private def nValueNot(field: String): NestedCond = peek match {
      case Some(NotTok) => advance(); NNot(nValueNot(field))
      case Some(LP) =>
        advance()
        val inner = nValueOr(field)
        require(peek.contains(RP),
          s"kql: expected ')' in the nested value group but found $peekRaw in <$q>")
        advance()
        inner
      case _ => nValueAtom(field)
    }

    private def nValueAtom(field: String): NestedCond = advance() match {
      case Quoted(text) => NPhrase(field, text)
      case w: Word =>
        val text = w.text
        def liveStar(cs: Seq[EChar]): Boolean = cs.exists(e => !e.esc && e.c == '*')
        if (text == "*" && !w.chars.head.esc) NExists(field)
        else if (!w.chars.last.esc && w.chars.last.c == '*' &&
          !liveStar(w.chars.dropRight(1)) && w.chars.length > 1) {
          NPrefix(field, text.dropRight(1))
        } else if (liveStar(w.chars)) {
          throw new IllegalArgumentException(
            s"kql: mid-value wildcards are not supported inside nested braces " +
              s"(<$text> on '$field') — trailing-star prefix and phrase forms are, in <$q>")
        } else {
          val terms = graft.expr.TextMatch.analyze(text)
          require(terms.nonEmpty, s"kql: nested value <$text> has no analyzable term in <$q>")
          nConj(terms.map(t => NTerm(field, t): NestedCond), or = true)
        }
      case t => throw new IllegalArgumentException(
        s"kql: expected a value for nested field '$field' but found '$t' in <$q>")
    }

    private def nRange(field: String, op: String): NestedCond = {
      val v = advance() match {
        case w: Word => w.text
        case Quoted(text) => text
        case t => throw new IllegalArgumentException(
          s"kql: expected a range bound after nested '$field $op' but found '$t' in <$q>")
      }
      op match {
        case ">" => NRange(field, Some(v), None, loInclusive = false)
        case ">=" => NRange(field, Some(v), None, loInclusive = true)
        case "<" => NRange(field, None, Some(v), hiInclusive = false)
        case "<=" => NRange(field, None, Some(v), hiInclusive = true)
      }
    }

    private def valueOr(field: String): FilterSpec = {
      val parts = Seq.newBuilder[FilterSpec]
      parts += valueAnd(field)
      while (peek.contains(OrTok)) { advance(); parts += valueAnd(field) }
      conj(parts.result(), or = true)
    }

    private def valueAnd(field: String): FilterSpec = {
      val parts = Seq.newBuilder[FilterSpec]
      parts += valueNot(field)
      while (peek.contains(AndTok)) { advance(); parts += valueNot(field) }
      conj(parts.result(), or = false)
    }

    private def valueNot(field: String): FilterSpec = peek match {
      case Some(NotTok) => advance(); FilterSpec.Not(valueNot(field))
      case Some(LP) =>
        advance()
        val inner = valueOr(field)
        require(peek.contains(RP), s"kql: expected ')' in the value group but found $peekRaw in <$q>")
        advance()
        inner
      case _ => valueAtom(field)
    }

    private def valueAtom(field: String): FilterSpec = advance() match {
      case Quoted(text) => FilterSpec.Phrase(field, text)
      case w: Word => valueAtomSpec(field, w)
      case t => throw new IllegalArgumentException(
        s"kql: expected a value for field '$field' but found '$t' in <$q>")
    }

    private def valueAtomSpec(field: String, w: Word): FilterSpec = {
      val text = w.text
      def liveStar(cs: Seq[EChar]): Boolean = cs.exists(e => !e.esc && e.c == '*')
      if (text == "*" && !w.chars.head.esc) FilterSpec.Exists(field)
      else if (!w.chars.last.esc && w.chars.last.c == '*' &&
        !liveStar(w.chars.dropRight(1)) && w.chars.length > 1) {
        FilterSpec.AnalyzedPrefix(field, text.dropRight(1))
      } else if (liveStar(w.chars)) {
        // mixed/mid-value stars: raw-field wildcard; escaped stars stay
        // literal by reconstructing the backslash for Wildcard.toLike
        val pattern = w.chars.map(e => if (e.esc) "\\" + e.c else e.c.toString).mkString
        FilterSpec.Wildcard(field, pattern)
      } else {
        // an unquoted value is an analyzed MATCH: any term may appear
        // (match's default OR — Kibana's documented "quick brown fox in
        // any order" rule); exact-all-terms needs quotes or `and`
        val terms = graft.expr.TextMatch.analyze(text)
        require(terms.nonEmpty, s"kql: value <$text> has no analyzable term in <$q>")
        conj(terms.map(t => FilterSpec.TermMatch(field, t)), or = true)
      }
    }

    private def rangeClause(field: String, op: String): FilterSpec = {
      val v = advance() match {
        case w: Word => w.text
        case Quoted(text) => text
        case t => throw new IllegalArgumentException(
          s"kql: expected a range bound after '$field $op' but found '$t' in <$q>")
      }
      op match {
        case ">" => FilterSpec.TermRange(field, Some(v), None, loInclusive = false)
        case ">=" => FilterSpec.TermRange(field, Some(v), None, loInclusive = true)
        case "<" => FilterSpec.TermRange(field, None, Some(v), hiInclusive = false)
        case "<=" => FilterSpec.TermRange(field, None, Some(v), hiInclusive = true)
      }
    }

    private def conj(specs: Seq[FilterSpec], or: Boolean): FilterSpec =
      if (specs.size == 1) specs.head
      else if (or) FilterSpec.Or(specs)
      else FilterSpec.And(specs)
  }
}
