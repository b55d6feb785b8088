package graft

/** SQL-surface registration: every custom expression callable from
  * `spark.sql`, values agreeing with the Column API.
  */
class GraftExtensionsSpec extends SparkSpecBase {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("geohash from SQL") {
    Seq((39.29, -76.61)).toDF("lat", "lon").createOrReplaceTempView("pts")
    assert(spark.sql("SELECT geohash(lat, lon, 4) FROM pts").as[String].head()
      === graft.expr.GeohashAlgo.encode(39.29, -76.61, 4))
  }

  test("vector functions from SQL") {
    val (d, c, s) = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)), " +
        "vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), " +
        "vec_sum(array(1.5d, -2.0d, 4.0d))")
      .as[(Double, Double, Double)].head()
    assert(d === 11.0 && c === 1.0 && s === 3.5)
  }

  test("language id from SQL agrees with the Column API") {
    val (sql, api) = spark.sql(
      "SELECT graft_language_id('the quick brown fox jumps over the lazy dog')")
      .as[String].head() ->
      Seq("the quick brown fox jumps over the lazy dog").toDF("t")
        .select(graft.ops.TextAnalysis.languageId(org.apache.spark.sql.functions.col("t")))
        .as[String].head()
    assert(sql === api && sql === "en")
  }

  test("text kernels from SQL agree with the Column API") {
    val toks = spark.sql("SELECT graft_tokenize('Hello, World-42!')")
      .as[Seq[String]].head()
    assert(toks === Seq("hello", "world", "42"))
    val n = spark.sql(
      "SELECT graft_count_in_set(graft_tokenize('the cat and the hat'), array('the', 'and'))")
      .as[Int].head()
    assert(n === 3)
    val j = spark.sql(
      "SELECT graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L))")
      .as[Double].head()
    assert(j === 0.5)
  }

  test("portable fingerprint kernels from SQL agree with the Column API") {
    import org.apache.spark.sql.functions.{col, lit}
    val text = "the quick brown fox jumps over the lazy dog"
    val viaSql = spark.sql(s"SELECT graft_gram_hashes('$text', 2)")
      .as[Seq[Long]].head()
    val viaCol = Seq(text).toDF("t")
      .select(graft.expr.Winnow.gramHashes(col("t"), 2)).as[Seq[Long]].head()
    assert(viaSql === viaCol && viaSql.nonEmpty)
    val winSql = spark.sql(s"SELECT graft_winnow('$text', 2, 3)").as[Seq[Long]].head()
    val winCol = Seq(text).toDF("t")
      .select(graft.expr.Winnow.fingerprints(col("t"), 2, 3)).as[Seq[Long]].head()
    assert(winSql === winCol && winSql.nonEmpty)
    // winnowed fingerprints are a subset of the full gram-hash set
    assert(winSql.toSet.subsetOf(viaSql.toSet))
    // non-literal k is a clear usage error, not a ClassCastException
    val e = intercept[Exception] {
      Seq(text).toDF("t").createOrReplaceTempView("gx_t")
      spark.sql("SELECT graft_gram_hashes(t, length(t)) FROM gx_t").collect()
    }
    assert(e.getMessage.contains("literal integer"))
  }

  test("vec_avg aggregate from SQL") {
    Seq((1, Seq(1.0, 2.0)), (1, Seq(3.0, 4.0))).toDF("g", "v")
      .createOrReplaceTempView("vecs_sql")
    val m = spark.sql("SELECT vec_avg(v) FROM vecs_sql GROUP BY g")
      .as[Seq[Double]].head()
    assert(m === Seq(2.0, 3.0))
  }

  test("full dedup pipeline expressible in pure SQL") {
    Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "other text entirely"))
      .toDF("id", "text").createOrReplaceTempView("docs_sql")
    val out = spark.sql(
      """SELECT a.id AS id_a, b.id AS id_b,
        |  graft_jaccard_sorted(sort_array(graft_shingles(a.text, 2)),
        |                       sort_array(graft_shingles(b.text, 2))) AS j
        |FROM docs_sql a JOIN docs_sql b ON a.id < b.id
        |WHERE graft_jaccard_sorted(sort_array(graft_shingles(a.text, 2)),
        |                           sort_array(graft_shingles(b.text, 2))) >= 0.9
        |""".stripMargin).as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 1.0)))
  }
}
