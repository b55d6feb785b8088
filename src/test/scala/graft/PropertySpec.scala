package graft

import graft.expr.{GeohashAlgo, TextShingleAlgo}
import graft.schema.VarType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5): driver-side invariants that don't need a
  * SparkSession — name sanitization idempotence, vartype round-trips,
  * geohash containment, tokenizer/regex agreement. Raw ScalaCheck (the
  * scalatest bridge artifact isn't in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val nameGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ',', ';', '{', '}', '(', ')', '=', '/', '_')))
      .map(_.mkString)

  test("column-name sanitization is idempotent") {
    val invalid = "[ ,;{}()\n\t=/&#]"
    check("sanitize")(Prop.forAll(nameGen) { name =>
      val once = name.replaceAll(invalid, "").toLowerCase
      once.replaceAll(invalid, "").toLowerCase == once
    })
  }

  test("VarType serialize/parse round-trips") {
    val vt: Gen[VarType] = Gen.oneOf(
      Gen.const(VarType.Identifier), Gen.const(VarType.DateTime),
      Gen.const(VarType.Bool), Gen.const(VarType.Text), Gen.const(VarType.Unknown),
      for {
        lo <- Gen.chooseNum(-1000, 1000); hi <- Gen.chooseNum(-1000, 1000)
        step <- Gen.oneOf(1.0, 0.1, 10.0)
      } yield VarType.Range(lo.toDouble, hi.toDouble, step),
      Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)).map(VarType.Enum(_)),
    )
    check("vartype")(Prop.forAll(vt) { t => VarType.parse(t.serialize) == t })
  }

  test("geohash encode/decode containment at any precision") {
    check("geohash-contain")(Prop.forAll(
      Gen.chooseNum(-89.999, 89.999), Gen.chooseNum(-179.999, 179.999),
      Gen.chooseNum(1, 8)) { (lat, lon, p) =>
      val h = GeohashAlgo.encode(lat, lon, p)
      val (latLo, latHi, lonLo, lonHi) = GeohashAlgo.decodeBounds(h)
      h.length == p && latLo <= lat && lat <= latHi && lonLo <= lon && lon <= lonHi
    })
  }

  test("geohash prefixes nest: the precision-4 cell refines the precision-3 cell") {
    check("geohash-nest")(Prop.forAll(
      Gen.chooseNum(-89.0, 89.0), Gen.chooseNum(-179.0, 179.0)) { (lat, lon) =>
      GeohashAlgo.encode(lat, lon, 3) == GeohashAlgo.encode(lat, lon, 4).take(3)
    })
  }

  test("native tokenizer agrees with the regex definition on arbitrary strings") {
    check("tokenize")(Prop.forAll(Gen.asciiStr, Gen.alphaNumStr) { (a, b) =>
      val s = a + " " + b
      val expected = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      TextShingleAlgo.tokenize(UTF8String.fromString(s)).toSeq == expected
    })
  }

  test("sorted-merge jaccard equals the set definition") {
    check("jaccard")(Prop.forAll(
      Gen.listOf(Gen.chooseNum(0L, 40L)), Gen.listOf(Gen.chooseNum(0L, 40L))) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val expected =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.toSet.intersect(sb.toSet).size.toDouble / sa.toSet.union(sb.toSet).size
      val got = TextShingleAlgo.jaccardSorted(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(sa.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(sb.toArray))
      math.abs(got - expected) < 1e-12
    })
  }

  test("FilterSpec render never throws and is non-empty") {
    check("render")(Prop.forAll(
      nameGen.suchThat(_.nonEmpty), Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-100.0, 100.0)) {
      (f, lo, hi) => graft.query.FilterSpec.NumericRange(f, lo, hi).render.nonEmpty
    })
  }
}
