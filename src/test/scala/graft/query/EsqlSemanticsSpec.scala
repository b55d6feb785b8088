package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

/** Adversarial semantic certification of the ES|QL EXPRESSION compiler
  * (`Esql.column` — the script_score seam): seeded random expression
  * trees over a typed row (ints, doubles, strings, booleans, nulls),
  * evaluated by an INDEPENDENT Scala interpreter implementing the
  * documented semantics — Kleene three-valued null logic, Spark's `/`
  * always-double division, Spark's total NaN ordering (NaN == NaN is
  * TRUE and NaN sorts above everything — Spark SQL's rule, NOT raw
  * IEEE), CASE/COALESCE null flow — and compared value-for-value
  * against the compiled Column on every row. Zero disagreements.
  */
class EsqlSemanticsSpec extends SparkSpecBase {
  import spark.implicits._

  // ----- the independent interpreter: Option[Any] with Kleene logic ----

  private type V = Option[Any]

  private def num(v: Any): Double = v match {
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case d: Double => d
    case other => fail(s"not numeric: $other")
  }

  /** Spark's comparison semantics for doubles: total order with
    * NaN == NaN true and NaN greatest (java.lang.Double.compare).
    */
  private def cmp(a: V, b: V): Option[Int] = (a, b) match {
    case (Some(x: String), Some(y: String)) => Some(x.compareTo(y))
    case (Some(x: Boolean), Some(y: Boolean)) => Some(x.compareTo(y))
    case (Some(x), Some(y)) => Some(java.lang.Double.compare(num(x), num(y)))
    case _ => None
  }

  private sealed trait E
  private case class CRef(name: String) extends E
  private case class CLit(v: Any) extends E // null encodes as null
  private case class CBin(op: String, l: E, r: E) extends E
  private case class CNot(e: E) extends E
  private case class CCase(cond: E, a: E, b: E) extends E
  private case class CCoalesce(a: E, b: E) extends E
  private case class CFn(name: String, args: Seq[E]) extends E

  private def eval(e: E, row: Map[String, Any]): V = e match {
    case CRef(n) => Option(row(n))
    case CLit(null) => None
    case CLit(v) => Some(v)
    case CNot(x) => eval(x, row).map { case b: Boolean => !b }
    case CCase(c, a, b) => eval(c, row) match {
      // when() reads a null condition as NOT matched -> the else branch
      case Some(true) => eval(a, row)
      case _ => eval(b, row)
    }
    case CCoalesce(a, b) => eval(a, row).orElse(eval(b, row))
    case CBin("and", l, r) => (eval(l, row), eval(r, row)) match {
      // Kleene: false dominates null
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case CBin("or", l, r) => (eval(l, row), eval(r, row)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case CBin("==", l, r) => cmp(eval(l, row), eval(r, row)).map(_ == 0)
    case CBin("!=", l, r) => cmp(eval(l, row), eval(r, row)).map(_ != 0)
    case CBin("<", l, r) => cmp(eval(l, row), eval(r, row)).map(_ < 0)
    case CBin("<=", l, r) => cmp(eval(l, row), eval(r, row)).map(_ <= 0)
    case CBin(">", l, r) => cmp(eval(l, row), eval(r, row)).map(_ > 0)
    case CBin(">=", l, r) => cmp(eval(l, row), eval(r, row)).map(_ >= 0)
    case CBin("/", l, r) =>
      // ALWAYS double division; a zero divisor yields NULL (try_divide —
      // the module contract, ES|QL's own divide-by-zero behavior)
      for (a <- eval(l, row); b <- eval(r, row); if num(b) != 0.0)
        yield num(a) / num(b)
    case CBin(op, l, r) =>
      for (a <- eval(l, row); b <- eval(r, row)) yield op match {
        // ints stay exact under + - * (the generator keeps them small)
        case "+" => (a, b) match {
          case (x: Int, y: Int) => x + y
          case _ => num(a) + num(b)
        }
        case "-" => (a, b) match {
          case (x: Int, y: Int) => x - y
          case _ => num(a) - num(b)
        }
        case "*" => (a, b) match {
          case (x: Int, y: Int) => x * y
          case _ => num(a) * num(b)
        }
      }
    case CFn("ABS", Seq(x)) => eval(x, row).map {
      case i: Int => math.abs(i)
      case v => math.abs(num(v))
    }
    case CFn("FLOOR", Seq(x)) => eval(x, row).map(v => math.floor(num(v)).toLong)
    case CFn("GREATEST", args) =>
      // Spark's greatest SKIPS nulls (null only when all are null)
      val vs = args.flatMap(eval(_, row))
      if (vs.isEmpty) None
      else Some(vs.reduce((a, b) => if (java.lang.Double.compare(num(a), num(b)) >= 0) a else b))
    // the trig/math family delegates to the SAME JVM libm on both sides
    // (Spark's Sin/Cos/... codegen to java.lang.Math), so comparison is
    // bit-exact — no tolerance anywhere in this certification
    case CFn("SIN", Seq(x)) => eval(x, row).map(v => math.sin(num(v)))
    case CFn("COS", Seq(x)) => eval(x, row).map(v => math.cos(num(v)))
    case CFn("TANH", Seq(x)) => eval(x, row).map(v => math.tanh(num(v)))
    case CFn("TO_DEGREES", Seq(x)) => eval(x, row).map(v => math.toDegrees(num(v)))
    case CFn("TO_RADIANS", Seq(x)) => eval(x, row).map(v => math.toRadians(num(v)))
    case CFn("HYPOT", Seq(x, y)) =>
      for (a <- eval(x, row); b <- eval(y, row)) yield math.hypot(num(a), num(b))
    case CFn("ATAN2", Seq(x, y)) =>
      for (a <- eval(x, row); b <- eval(y, row)) yield math.atan2(num(a), num(b))
    case CFn("LOCATE", Seq(x, y)) =>
      // 1-based, 0 when absent (Spark's locate; indexOf + 1 covers both)
      for (a <- eval(x, row); b <- eval(y, row))
        yield (a, b) match { case (s: String, sub: String) => s.indexOf(sub) + 1 }
    case CFn("HASH", Seq(CLit(alg: String), x)) => eval(x, row).map { case s: String =>
      java.security.MessageDigest.getInstance(alg.toUpperCase)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    case CFn("LENGTH", Seq(x)) => eval(x, row).map { case s: String => s.length }
    case CFn("TO_UPPER", Seq(x)) => eval(x, row).map { case s: String => s.toUpperCase }
    case CFn("CONCAT", args) =>
      val vs = args.map(eval(_, row))
      if (vs.exists(_.isEmpty)) None
      else Some(vs.flatten.map { case s: String => s }.mkString)
    case CFn("SUBSTRING", Seq(x, CLit(st: Int), CLit(ln: Int))) =>
      eval(x, row).map { case s: String =>
        // 1-based; a negative start counts from the end WITHOUT clamping:
        // the window [start, start+len) is fixed first, then intersected
        // with the string, so out-of-range prefix positions CONSUME
        // length (SUBSTRING("ab", -3, 1) is "", not "a") — Spark's
        // substringSQL rule, which this certification caught
        val start0 =
          if (st > 0) st - 1
          else if (st == 0) 0
          else s.length + st
        val from = math.min(math.max(start0, 0), s.length)
        val until = math.max(
          math.min(start0.toLong + math.max(ln, 0).toLong, s.length.toLong).toInt, from)
        s.substring(from, until)
      }
    case other => fail(s"unhandled interpreter node $other")
  }

  // ----- render the same tree as ES|QL source text -----

  private def render(e: E): String = e match {
    case CRef(n) => n
    case CLit(null) => "NULL"
    case CLit(s: String) => "\"" + s + "\""
    case CLit(b: Boolean) => b.toString.toUpperCase
    case CLit(i: Int) => if (i < 0) s"(0 - ${-i})" else i.toString
    case CLit(d: Double) => if (d < 0) s"(0.0 - ${-d})" else d.toString
    case CBin(op, l, r) =>
      val o = op match { case "and" => "AND"; case "or" => "OR"; case x => x }
      s"(${render(l)} $o ${render(r)})"
    case CNot(x) => s"(NOT ${render(x)})"
    case CCase(c, a, b) => s"CASE(${render(c)}, ${render(a)}, ${render(b)})"
    case CCoalesce(a, b) => s"COALESCE(${render(a)}, ${render(b)})"
    case CFn(n, args) => s"$n(${args.map(render).mkString(", ")})"
  }

  // ----- generator: typed random trees -----

  private val rnd = new scala.util.Random(2024)

  private def genNum(depth: Int): E =
    if (depth <= 0) rnd.nextInt(6) match {
      case 0 => CRef("a")
      case 1 => CRef("b")
      case 2 => CRef("n") // nullable int
      case 3 => CLit(rnd.nextInt(19) - 9)
      case 4 => CLit(math.round((rnd.nextDouble() - 0.5) * 200) / 10.0)
      case 5 => CRef("a")
    } else rnd.nextInt(14) match {
      case 0 => CBin("+", genNum(depth - 1), genNum(depth - 1))
      case 1 => CBin("-", genNum(depth - 1), genNum(depth - 1))
      case 2 => CBin("*", genNum(depth - 1), genNum(depth - 1))
      case 3 => CBin("/", genNum(depth - 1), genNum(depth - 1))
      case 4 => CFn("ABS", Seq(genNum(depth - 1)))
      case 5 => CFn("GREATEST", Seq(genNum(depth - 1), genNum(depth - 1)))
      case 6 => CCase(genBool(depth - 1), genNum(depth - 1), genNum(depth - 1))
      case 7 => CCoalesce(genNum(depth - 1), genNum(depth - 1))
      case 8 => CFn("SIN", Seq(genNum(depth - 1)))
      case 9 => CFn("COS", Seq(genNum(depth - 1)))
      case 10 => CFn("TANH", Seq(genNum(depth - 1)))
      case 11 => CFn(Seq("TO_DEGREES", "TO_RADIANS")(rnd.nextInt(2)), Seq(genNum(depth - 1)))
      case 12 => CFn(Seq("HYPOT", "ATAN2")(rnd.nextInt(2)),
        Seq(genNum(depth - 1), genNum(depth - 1)))
      case 13 => CFn("LOCATE", Seq(genStr(depth - 1), genStr(depth - 1)))
    }

  private def genStr(depth: Int): E =
    if (depth <= 0) rnd.nextInt(3) match {
      case 0 => CRef("s")
      case 1 => CRef("sn") // nullable string
      case 2 => CLit(Seq("ab", "xyz", "Hello")(rnd.nextInt(3)))
    } else rnd.nextInt(5) match {
      case 0 => CFn("TO_UPPER", Seq(genStr(depth - 1)))
      case 1 => CFn("CONCAT", Seq(genStr(depth - 1), genStr(depth - 1)))
      case 2 => CFn("SUBSTRING", Seq(genStr(depth - 1),
        CLit(rnd.nextInt(7) - 3), CLit(rnd.nextInt(4))))
      case 3 => CCoalesce(genStr(depth - 1), genStr(depth - 1))
      case 4 => CFn("HASH", Seq(CLit(Seq("md5", "sha1")(rnd.nextInt(2))),
        genStr(depth - 1)))
    }

  private def genBool(depth: Int): E =
    if (depth <= 0) {
      val op = Seq("==", "!=", "<", "<=", ">", ">=")(rnd.nextInt(6))
      if (rnd.nextBoolean()) CBin(op, genNum(0), genNum(0))
      else CBin(op, genStr(0), genStr(0))
    } else rnd.nextInt(4) match {
      case 0 => CBin("and", genBool(depth - 1), genBool(depth - 1))
      case 1 => CBin("or", genBool(depth - 1), genBool(depth - 1))
      case 2 => CNot(genBool(depth - 1))
      case 3 => CBin(Seq("==", "<", ">=")(rnd.nextInt(3)),
        genNum(depth - 1), genNum(depth - 1))
    }

  test("Esql.column ≡ independent interpreter over 150 seeded random expressions × 40 rows") {
    val rows = (1 to 40).map { i =>
      val r = new scala.util.Random(i * 31)
      Map[String, Any](
        "a" -> (r.nextInt(19) - 9),
        "b" -> (math.round((r.nextDouble() - 0.5) * 200) / 10.0),
        "n" -> (if (r.nextInt(3) == 0) null else Integer.valueOf(r.nextInt(9) - 4)),
        "s" -> Seq("ab", "xyz", "Hello", "spark scan")(r.nextInt(4)),
        "sn" -> (if (r.nextInt(3) == 0) null else "tok"))
    }
    val df = rows.map(m => (m("a").asInstanceOf[Int],
      m("b").asInstanceOf[Double],
      m("n").asInstanceOf[Integer],
      m("s").asInstanceOf[String],
      m("sn").asInstanceOf[String]))
      .toDF("a", "b", "n", "s", "sn")
    df.cache().count()

    var disagreements = 0
    (1 to 150).foreach { _ =>
      val tree = rnd.nextInt(3) match {
        case 0 => genNum(2 + rnd.nextInt(2))
        case 1 => genBool(2)
        case 2 => genStr(2)
      }
      val source = render(tree)
      val got = df.withColumn("_r", Esql.column(source)).select("_r").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.get(0)))
      rows.zip(got).zipWithIndex.foreach { case ((row, g), ri) =>
        val want = eval(tree, row)
        val same = (want, g) match {
          case (None, None) => true
          case (Some(w), Some(v)) => (w, v) match {
            case (x: String, y: String) => x == y
            case (x: Boolean, y: Boolean) => x == y
            case _ => java.lang.Double.compare(num(w), num(v)) == 0
          }
          case _ => false
        }
        if (!same) {
          disagreements += 1
          if (disagreements <= 5)
            info(s"DISAGREE on <$source> row $ri: interp=$want spark=$g")
        }
      }
    }
    assert(disagreements == 0, s"$disagreements disagreements — expression semantics diverged")
  }
}
