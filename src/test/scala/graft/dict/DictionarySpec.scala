package graft.dict

import graft.SparkSpecBase
import graft.etl.Harmonizer
import org.apache.spark.sql.functions._

/** A1-A2 + §1.4: the single-pass profiler against hand-computed stats, the
  * vartype inference CASE, and the dictionary's deliberate string quirks.
  */
class DictionarySpec extends SparkSpecBase {
  import spark.implicits._

  private def frame = Seq(
    (Some(1), Some("a"), Some(1.0)),
    (Some(2), Some("b"), Some(2.0)),
    (Some(2), None, Some(3.0)),
    (Some(4), Some("b"), None),
  ).toDF("num", "str", "dbl")

  private def entry(field: String) =
    Dictionary.profile(frame).where(col("dict_field") === field).collect().head

  test("counts, distinct, missing per column") {
    val num = entry("num")
    assert(num.getAs[Long]("dict_count") === 4)
    assert(num.getAs[Long]("dict_countdistinct") === 3)
    assert(num.getAs[Long]("dict_countmissing") === 0)
    val str = entry("str")
    assert(str.getAs[Long]("dict_count") === 3)
    assert(str.getAs[Long]("dict_countdistinct") === 2)
    assert(str.getAs[Long]("dict_countmissing") === 1)
  }

  test("mean/stddev populated for numerics, null for strings (reference :363-368)") {
    assert(math.abs(entry("num").getAs[Double]("dict_mean") - 2.25) < 1e-12)
    assert(entry("str").isNullAt(entry("str").fieldIndex("dict_mean")))
    // stddev is population stddev, as in the reference's STDDEV_POP
    assert(math.abs(entry("dbl").getAs[Double]("dict_stddev") - math.sqrt(2.0 / 3)) < 1e-12)
  }

  test("min/max are strings computed in native order (dict_min/max STRING quirk)") {
    // native numeric min of (1,2,2,4) is 1; a lexicographic string min of
    // ("1","2","2","4") is also "1" but e.g. (9, 10) would differ — pin it:
    val df = Seq(9, 10).toDF("n")
    val e = Dictionary.profile(df).collect().head
    assert(e.getAs[String]("dict_min") === "9")
    assert(e.getAs[String]("dict_max") === "10")
  }

  test("all-null column profiles with countdistinct 0") {
    val df = Seq(Some("x"), Some("y")).toDF("a").withColumn("b", lit(null).cast("string"))
    val e = Dictionary.profile(df).where(col("dict_field") === "b").collect().head
    assert(e.getAs[Long]("dict_count") === 0)
    assert(e.getAs[Long]("dict_countdistinct") === 0)
    assert(e.getAs[Long]("dict_countmissing") === 2)
  }

  test("vartype inference: text / boolean / continuous range / stepped range") {
    // text: no mean (string column)
    assert(entry("str").getAs[String]("dict_vartype") === "text")
    // boolean: exactly {0, 1}
    val boolDf = Seq(0, 1, 0, 1).toDF("flag")
    assert(Dictionary.profile(boolDf).collect().head.getAs[String]("dict_vartype") === "boolean")
    // continuous: more distincts than integer span
    val contDf = Seq(0.1, 0.2, 0.3, 0.35, 0.5).toDF("ratio")
    assert(Dictionary.profile(contDf).collect().head.getAs[String]("dict_vartype") === "range,0,1,0.1")
    // stepped: integer-spaced values → floor((2017/10)+1)*10 = 2020
    val stepDf = Seq(2000, 2005, 2017).toDF("yr")
    assert(Dictionary.profile(stepDf).collect().head.getAs[String]("dict_vartype") === "range,0,2020,1")
  }

  test("harmonized metadata flows through: uifilter is the string 'True'/'False'") {
    val df = Seq(("39.2,-76.6", 2017)).toDF("geolocation", "year")
    val dict = Dictionary.profile(df)
    val geo = dict.where(col("dict_field") === "geolocation").collect().head
    assert(geo.getAs[String]("dict_uifilter") === "False") // identifiers are not filterable
    assert(geo.getAs[String]("dict_vartype") === "identifier")
    val yr = dict.where(col("dict_field") === "year").collect().head
    assert(yr.getAs[String]("dict_uifilter") === "True")
    assert(yr.getAs[String]("dict_vartype") === "range,2000,2017,1")
  }

  test("profileHarmonized threads lineage into dict_varmapping") {
    val h = Harmonizer(Seq(("HOMICIDE", 1)).toDF("Desc", "n"))
      .mapVar("Desc", "description")
      .mapValues("description", Seq("HOMICIDE" -> "Homicide"))
    val dict = Dictionary.profileHarmonized(h)
    val d = dict.where(col("dict_field") === "description").collect().head
    assert(d.getAs[String]("dict_varmapping").contains("Source Desc"))
  }

  test("approximate-distinct mode stays within HLL tolerance") {
    val df = (1 to 1000).toDF("n")
    val e = Dictionary.profile(df, exactDistinct = false).collect().head
    val cd = e.getAs[Long]("dict_countdistinct")
    assert(cd > 900 && cd < 1100)
  }

  test("varTypes parses the widget ADT") {
    val types = Dictionary.varTypes(Dictionary.profile(Seq(0, 1).toDF("flag")))
    assert(types("flag") === graft.schema.VarType.Bool)
  }

  test("incremental profiles merge to the full-corpus dictionary") {
    val df = Seq(
      (1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a"), (4, 40.0, null.asInstanceOf[String]),
    ).toDF("id", "x", "s")

    def byField(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getAs[String]("dict_field") -> r).toMap

    // finalize(increment(df)) agrees with the cold one-shot profiler
    val inc = byField(Dictionary.finalizeIncrement(Dictionary.profileIncrement(df)))
    val cold = byField(Dictionary.profile(df))
    for (f <- Seq("id", "x", "s")) {
      assert(inc(f).getAs[Long]("dict_count") === cold(f).getAs[Long]("dict_count"))
      assert(inc(f).getAs[Long]("dict_countmissing") === cold(f).getAs[Long]("dict_countmissing"))
      assert(inc(f).getAs[String]("dict_min") === cold(f).getAs[String]("dict_min"))
      assert(inc(f).getAs[String]("dict_max") === cold(f).getAs[String]("dict_max"))
      // HLL sketches are exact at tiny cardinalities
      assert(inc(f).getAs[Long]("dict_countdistinct") === cold(f).getAs[Long]("dict_countdistinct"))
      assert(inc(f).getAs[String]("dict_vartype") === cold(f).getAs[String]("dict_vartype"))
    }
    assert(math.abs(inc("x").getAs[Double]("dict_mean") - 25.0) < 1e-9)
    // σ_pop of {10,20,30,40} = sqrt(125)
    assert(math.abs(inc("x").getAs[Double]("dict_stddev") - math.sqrt(125.0)) < 1e-9)

    // split → per-partition increments → merge == whole-corpus increment
    val merged = byField(Dictionary.finalizeIncrement(Dictionary.mergeIncrements(
      Dictionary.profileIncrement(df.where(col("id") <= 2)),
      Dictionary.profileIncrement(df.where(col("id") > 2)))))
    for (f <- Seq("id", "x", "s")) {
      assert(merged(f).getAs[Long]("dict_count") === inc(f).getAs[Long]("dict_count"))
      assert(merged(f).getAs[Long]("dict_countdistinct") === inc(f).getAs[Long]("dict_countdistinct"))
      assert(merged(f).getAs[String]("dict_min") === inc(f).getAs[String]("dict_min"))
      assert(merged(f).getAs[String]("dict_max") === inc(f).getAs[String]("dict_max"))
    }
    assert(math.abs(merged("x").getAs[Double]("dict_stddev") -
      inc("x").getAs[Double]("dict_stddev")) < 1e-9)
    // numeric min/max merged under NUMERIC order even where lexicographic
    // order disagrees ("9" > "10" as strings)
    val tricky = Dictionary.finalizeIncrement(Dictionary.mergeIncrements(
      Dictionary.profileIncrement(Seq(9).toDF("n")),
      Dictionary.profileIncrement(Seq(10).toDF("n"))))
    val t = byField(tricky)("n")
    assert(t.getAs[String]("dict_min") === "9" && t.getAs[String]("dict_max") === "10")
  }

  test("mergeable KLL quantiles: split-merge agrees with whole-corpus and exact percentiles") {
    val values = (1 to 400).map(_.toDouble)
    val df = values.map(v => (v.toLong, v)).toDF("id", "x")

    // whole-corpus sketch ≈ exact percentile (KLL stores all 400 values at
    // default k — exact at this size)
    val whole = Dictionary.finalizeQuantiles(
      Dictionary.quantileIncrement(df), probs = Seq(0.25, 0.5, 0.75))
      .where(col("dict_field") === "x").collect().head
    val exact = df.selectExpr("percentile(x, array(0.25d, 0.5d, 0.75d)) AS q")
      .collect().head.getSeq[Double](0)
    for ((p, i) <- Seq("p25", "p50", "p75").zipWithIndex)
      assert(math.abs(whole.getAs[Double](p) - exact(i)) <= 2.0,
        s"$p: sketch ${whole.getAs[Double](p)} vs exact ${exact(i)}")

    // split → merge lands within KLL rank error of the whole-corpus sketch
    val merged = Dictionary.finalizeQuantiles(
      Dictionary.mergeQuantileIncrements(
        Dictionary.quantileIncrement(df.where(col("id") <= 200)),
        Dictionary.quantileIncrement(df.where(col("id") > 200))),
      probs = Seq(0.25, 0.5, 0.75))
      .where(col("dict_field") === "x").collect().head
    for (p <- Seq("p25", "p50", "p75"))
      assert(math.abs(merged.getAs[Double](p) - whole.getAs[Double](p)) <= 8.0,
        s"$p: merged ${merged.getAs[Double](p)} vs whole ${whole.getAs[Double](p)}")

    // only numeric columns sketch
    assert(Dictionary.quantileIncrement(Seq((1, "a")).toDF("n", "s"))
      .select("dict_field").as[String].collect().toSeq === Seq("n"))
  }

  test("materializeProfile caches the dictionary and matches the cold profile") {
    val name = "dictspec_warm"
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("n", "s")
    try {
      val warm = Dictionary.materializeProfile(spark, df, name)
      // published as a local relation: the warm plan carries NO corpus
      // lineage (no scan, no aggregate) — it IS the at-rest rows
      assert(warm.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
      val cold = Dictionary.profile(df)
      val canon = (d: org.apache.spark.sql.DataFrame) =>
        d.orderBy("dict_field").collect().map(_.toString).toSeq
      assert(canon(warm) === canon(cold))
      // second call reuses the cached view — the by-name corpus argument is
      // never evaluated (a thrown-on-use frame proves it)
      def boom: org.apache.spark.sql.DataFrame = sys.error("corpus scan on warm path")
      val again = Dictionary.materializeProfile(spark, boom, name)
      assert(canon(again) === canon(cold))
    } finally {
      spark.catalog.dropTempView(name)
    }
  }
}
