package graft.query

/** Lucene `query_string` mini-grammar → [[FilterSpec]] compiler — the
  * Kibana search bar. Every saved dashboard the reference exports queries
  * through `query_string` with `analyze_wildcard: true`
  * (`notebooks/kibana-content/kibana-exported-visualizations.json`, each
  * `searchSourceJSON`), and the webapp's dictionary discovery issues
  * `query_string: {query: 'dict_field:*'}` (`services/webapp/src/
  * collections.js:79`) — so a user switching to this engine needs the
  * grammar, not just the widget compiler ([[FilterSpec]] Q1-Q9, which
  * this parser reuses node-for-node).
  *
  * Supported surface (the subset those dashboards and search bars use):
  *
  *  - boolean algebra: `AND`, `OR`, `NOT`, parentheses; adjacency is the
  *    default operator `OR` (Lucene's `default_operator` default);
  *    `NOT` binds tightest, then `AND`, then `OR`.
  *  - `field:term` — analyzed single-term match; bare terms hit
  *    `defaultField`.
  *  - `field:"a b"` — analyzed phrase; `"a b"~N` — sloppy phrase
  *    ([[FilterSpec.PhraseSlop]], ordered form, documented delta).
  *  - `field:pre*` — analyzed token prefix under `analyzeWildcard=true`
  *    (the reference's own setting); any other `*`/`?` shape — raw-field
  *    [[FilterSpec.Wildcard]] (ES's term-level wildcard query).
  *  - `field:*` — [[FilterSpec.Exists]]; a bare `*` — match_all (the
  *    dashboards' default query).
  *  - `field:term~N` / `field:term~` — fuzzy term, N ∈ {0,1,2}, bare `~`
  *    = 2 (Lucene's default max edits).
  *  - `field:[a TO b]` / `{a TO b}` — inclusive/exclusive range, sides
  *    mixable, `*` opens a side.
  *
  * Not supported (loud parse error, not silent drop): boosts (`^2`),
  * regex literals (`/…/`), `\`-escapes, `+`/`-` prefix operators.
  */
object QueryString {

  /** Parse `q` into a predicate AST. `defaultField` receives bare terms
    * and phrases (Kibana wires the index's default field here);
    * `analyzeWildcard` mirrors the searchSourceJSON flag — when set, a
    * single-trailing-`*` term analyzes to a token-prefix match instead of
    * a raw-field wildcard.
    */
  def parse(
      q: String,
      defaultField: String,
      analyzeWildcard: Boolean = true): FilterSpec = {
    val toks = tokenize(q)
    if (toks.isEmpty) FilterSpec.MatchAll
    else {
      val p = new Parser(toks, defaultField, analyzeWildcard)
      val spec = p.orExpr()
      require(p.exhausted, s"query_string: unexpected '${p.peekRaw}' after a complete query in <$q>")
      spec
    }
  }

  // ===== scanner =====

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok
  /** A field:value unit, quotes/brackets kept verbatim for the clause parser. */
  private final case class Unit(text: String) extends Tok

  private def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      q(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LP; i += 1
        case ')' => out += RP; i += 1
        case _ =>
          val start = i
          var depth = 0 // inside [..] / {..}
          var quoted = false
          var done = false
          while (i < q.length && !done) {
            val c = q(i)
            if (quoted) { if (c == '"') quoted = false; i += 1 }
            else if (c == '"') { quoted = true; i += 1 }
            else if (c == '[' || c == '{') { depth += 1; i += 1 }
            else if (c == ']' || c == '}') { depth -= 1; i += 1 }
            else if (depth == 0 && (c.isWhitespace || c == '(' || c == ')')) done = true
            else i += 1
          }
          require(!quoted, s"query_string: unterminated quote in <$q>")
          require(depth == 0, s"query_string: unterminated range bracket in <$q>")
          q.substring(start, i) match {
            case "AND" => out += AndTok
            case "OR" => out += OrTok
            case "NOT" => out += NotTok
            case u => out += Unit(u)
          }
      }
    }
    out.result()
  }

  // ===== recursive descent =====

  private final class Parser(
      toks: Vector[Tok], defaultField: String, analyzeWildcard: Boolean) {
    private var pos = 0
    def exhausted: Boolean = pos >= toks.length
    def peekRaw: String = if (exhausted) "<end>" else toks(pos).toString
    private def peek: Option[Tok] = if (exhausted) None else Some(toks(pos))
    private def advance(): Tok = {
      require(!exhausted, "query_string: query ends where a clause is expected")
      val t = toks(pos); pos += 1; t
    }

    /** orExpr := andExpr ((OR | adjacency) andExpr)* — adjacency is the
      * Lucene default operator (OR).
      */
    def orExpr(): FilterSpec = {
      val parts = Seq.newBuilder[FilterSpec]
      parts += andExpr()
      var more = true
      var n = 1
      while (more) {
        peek match {
          case Some(OrTok) => advance(); parts += andExpr(); n += 1
          case Some(LP) | Some(NotTok) | Some(Unit(_)) => parts += andExpr(); n += 1
          case _ => more = false
        }
      }
      val ps = parts.result()
      if (n == 1) ps.head else FilterSpec.Or(ps)
    }

    private def andExpr(): FilterSpec = {
      val parts = Seq.newBuilder[FilterSpec]
      parts += unary()
      var n = 1
      while (peek.contains(AndTok)) { advance(); parts += unary(); n += 1 }
      val ps = parts.result()
      if (n == 1) ps.head else FilterSpec.And(ps)
    }

    private def unary(): FilterSpec = peek match {
      case Some(NotTok) => advance(); FilterSpec.Not(unary())
      case _ => primary()
    }

    private def primary(): FilterSpec = advance() match {
      case LP =>
        val inner = orExpr()
        require(!exhausted && toks(pos) == RP,
          s"query_string: expected ')' but found $peekRaw")
        pos += 1
        inner
      case Unit(text) => clause(text)
      case t => throw new IllegalArgumentException(
        s"query_string: expected a clause but found $t")
    }

    // ===== clause classification =====

    private def clause(text: String): FilterSpec = {
      require(!text.exists(c => c == '^' || c == '\\' || c == '/') &&
        !text.startsWith("+") && !text.startsWith("-"),
        s"query_string: unsupported syntax in clause <$text> " +
          "(boosts, escapes, regex literals, +/- operators)")
      val colon = colonSplit(text)
      colon match {
        case Some((field, value)) => fielded(field, value, text)
        case None => fielded(defaultField, text, text)
      }
    }

    /** First ':' outside quotes — Lucene field separator. */
    private def colonSplit(text: String): Option[(String, String)] = {
      var i = 0
      var quoted = false
      while (i < text.length) {
        val c = text(i)
        if (c == '"') quoted = !quoted
        else if (c == ':' && !quoted)
          return Some((text.substring(0, i), text.substring(i + 1)))
        i += 1
      }
      None
    }

    private val FuzzySuffix = "^(.*?)~(\\d*)$".r

    private def fielded(field: String, value: String, raw: String): FilterSpec = {
      require(value.nonEmpty, s"query_string: empty value in clause <$raw>")
      if (value.startsWith("\"")) phraseClause(field, value, raw)
      else if (value.startsWith("[") || value.startsWith("{"))
        rangeClause(field, value, raw)
      else if (value == "*") {
        if (raw.contains(':')) FilterSpec.Exists(field) else FilterSpec.MatchAll
      } else value match {
        case FuzzySuffix(term, edits) if !term.contains("~") =>
          require(term.nonEmpty && !term.exists(c => c == '*' || c == '?'),
            s"query_string: fuzzy applies to a plain term, got <$raw>")
          FilterSpec.FuzzyTerm(field, term,
            if (edits.isEmpty) 2 else edits.toInt)
        case _ if analyzeWildcard && value.endsWith("*") &&
            !value.dropRight(1).exists(c => c == '*' || c == '?') &&
            value.length > 1 =>
          FilterSpec.AnalyzedPrefix(field, value.dropRight(1))
        case _ if value.exists(c => c == '*' || c == '?') =>
          FilterSpec.Wildcard(field, value)
        case _ =>
          require(!value.contains("~"),
            s"query_string: malformed fuzzy suffix in <$raw>")
          FilterSpec.TermMatch(field, value)
      }
    }

    private val PhraseRx = "^\"([^\"]*)\"(?:~(\\d+))?$".r

    private def phraseClause(field: String, value: String, raw: String): FilterSpec =
      value match {
        case PhraseRx(phrase, null) => FilterSpec.Phrase(field, phrase)
        case PhraseRx(phrase, slop) => FilterSpec.PhraseSlop(field, phrase, slop.toInt)
        case _ => throw new IllegalArgumentException(
          s"query_string: malformed phrase in <$raw>")
      }

    private val RangeRx = "^([\\[{])\\s*(\\S+)\\s+TO\\s+(\\S+)\\s*([\\]}])$".r

    private def rangeClause(field: String, value: String, raw: String): FilterSpec =
      value match {
        case RangeRx(l, lo, hi, r) =>
          FilterSpec.TermRange(field,
            if (lo == "*") None else Some(lo),
            if (hi == "*") None else Some(hi),
            loInclusive = l == "[", hiInclusive = r == "]")
        case _ => throw new IllegalArgumentException(
          s"query_string: malformed range in <$raw> (expected [a TO b])")
      }
  }
}
