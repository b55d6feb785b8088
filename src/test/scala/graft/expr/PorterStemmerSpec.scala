package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** The Snowball English ("Porter2") stemmer, certified against
  * hand-derived vectors: each pair below was traced BY HAND through the
  * published algorithm (snowballstem.org English stemmer — R1/R2,
  * steps 0-5, exceptional lists), so the suite is independent ground
  * truth, not an implementation echo.
  */
class PorterStemmerSpec extends AnyFunSuite {

  private val vectors: Seq[(String, String)] = Seq(
    // plurals / 1a
    "cats" -> "cat", "dogs" -> "dog", "gaps" -> "gap", "gas" -> "gas",
    "this" -> "this", "flies" -> "fli", "cries" -> "cri", "ties" -> "tie",
    "dies" -> "die", "caresses" -> "caress", "windows" -> "window",
    // 1b: eed / ed / ing with the at/bl/iz, double, short-word endings
    "agreed" -> "agre", "feed" -> "feed", "mating" -> "mate",
    "sized" -> "size", "troubled" -> "troubl", "hopping" -> "hop",
    "tanned" -> "tan", "running" -> "run", "fitted" -> "fit",
    "meeting" -> "meet", "filing" -> "file", "arguing" -> "argu",
    "growing" -> "grow", "rolling" -> "roll",
    // 1c and the y/Y consonant marking
    "cry" -> "cri", "happy" -> "happi", "say" -> "say", "by" -> "by",
    "says" -> "say", "enjoying" -> "enjoy",
    // step 2/3/4 chains
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "national" -> "nation",
    "electrical" -> "electr", "beautiful" -> "beauti",
    "happiness" -> "happi", "sensibility" -> "sensibl",
    "generously" -> "generous", "generate" -> "generat",
    "communication" -> "communic",
    "consign" -> "consign", "consigned" -> "consign",
    "consigning" -> "consign", "consignment" -> "consign",
    "consist" -> "consist", "consisted" -> "consist",
    "consistency" -> "consist", "consistent" -> "consist",
    "argument" -> "argument", "arguments" -> "argument",
    // step 5 e/l deletion and the short-syllable keep
    "merge" -> "merg", "merges" -> "merg", "merged" -> "merg",
    "merging" -> "merg", "hope" -> "hope", "hopeful" -> "hope",
    "knife" -> "knife", "controlled" -> "control",
    // exceptional lists
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "news" -> "news", "sky" -> "sky", "early" -> "earli", "only" -> "onli",
    "inning" -> "inning", "proceed" -> "proceed", "exceed" -> "exceed",
    // short words and non-letters pass through
    "be" -> "be", "a" -> "a", "x86" -> "x86", "k8s" -> "k8s")

  test("hand-derived Porter2 vectors") {
    val bad = vectors.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in: got ${PorterStemmer.stem(in)}, want $want"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("inflection families collapse to one stem — the recall property the analyzer buys") {
    for (family <- Seq(
        Seq("merge", "merges", "merged", "merging"),
        Seq("consign", "consigned", "consigning", "consignment"),
        Seq("run", "runs", "running"),
        Seq("connect", "connected", "connecting", "connection", "connections"))) {
      val stems = family.map(PorterStemmer.stem).distinct
      assert(stems.size == 1, s"$family -> $stems")
    }
    // and distinct words stay distinct
    assert(PorterStemmer.stem("mating") != PorterStemmer.stem("matting"))
  }
}
