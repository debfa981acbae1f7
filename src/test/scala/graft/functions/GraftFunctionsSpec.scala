package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions.{col, explode}

import graft.SparkFunSuite

class GraftFunctionsSpec extends SparkFunSuite {
  import spark.implicits._

  test("vec_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").head.getDouble(0)
    assert(got == 11.0)
  }

  test("rational_argmax is callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((3L, 4L, "x", "y"), (2L, 2L, "a", "b")).toDF("n", "d", "ta", "tb")
      .createOrReplaceTempView("rarg")
    val got = spark.sql(
      "SELECT rational_argmax(n, d, ta, tb).tie_a AS w FROM rarg")
      .head.getString(0)
    assert(got == "a") // 2/2 = 1 beats 3/4
  }

  test("vec_sq_dist: SQL surface, bit-equality with the zip_with fold, guards") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 5.0f))).toDF("a", "b")
      .createOrReplaceTempView("sqvecs")
    assert(spark.sql("SELECT vec_sq_dist(a, b) AS d FROM sqvecs")
      .head.getDouble(0) == 13.0)
    // bit-identical to the higher-order formulation it replaced, on
    // irrational-ish doubles where any reassociation would show
    val df = spark.range(64).select(
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(
          org.apache.spark.sql.functions.lit(1),
          org.apache.spark.sql.functions.lit(37)),
        j => org.apache.spark.sql.functions.sqrt(j * ($"id" + 2))).as("x"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(
          org.apache.spark.sql.functions.lit(1),
          org.apache.spark.sql.functions.lit(37)),
        j => org.apache.spark.sql.functions.sqrt(j * 7 + $"id")).as("y"))
    val mismatch = df.select(
      VecSqDist.sqDist($"x", $"y").as("fast"),
      org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.zip_with($"x", $"y",
          (p, q) => (p - q) * (p - q)),
        org.apache.spark.sql.functions.lit(0.0), (acc, t) => acc + t).as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mismatch == 0L, "VecSqDist must be bit-identical to the fold")
    // size mismatch throws; null element nulls
    val e = intercept[Exception] {
      spark.sql("SELECT vec_sq_dist(array(CAST(1.0 AS DOUBLE))," +
        " array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)))").collect()
    }
    assert(e.getMessage.contains("sizes differ") ||
      e.getCause != null && e.getCause.getMessage.contains("sizes differ"))
    assert(spark.sql(
      "SELECT vec_sq_dist(array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE))," +
        " array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) IS NULL")
      .head.getBoolean(0))
  }

  test("vec_dot SQL rejects wrong arity") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] { spark.sql("SELECT vec_dot(array(1.0))").collect() }
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("vec_dot"))
  }

  test("GraftExtensions installs without error (spark-submit seam)") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("composed column functions are callable from SQL and match the Column API") {
    GraftFunctions.register(spark)
    Seq(("the quick the fox", Array(3.0f, 4.0f)))
      .toDF("t", "v").createOrReplaceTempView("g")
    val r = spark.sql(
      """SELECT n, c, tc, j, s.q AS q, dr FROM (
        |  SELECT vec_l2_norm(v) AS n, vec_cosine(v, v) AS c,
        |         token_count(t) AS tc, char_jaccard(t, t) AS j,
        |         quantize_int8(v) AS s, dup_token_ratio(t) AS dr
        |  FROM g)""".stripMargin).head
    assert(r.getAs[Double]("n") == 5.0)
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.getAs[Int]("tc") == 4)
    assert(r.getAs[Double]("j") == 1.0)
    assert(r.getAs[scala.collection.Seq[Int]]("q").toSeq == Seq(95, 127))
    assert(r.getAs[Double]("dr") == 0.25) // "the" repeats once in 4 tokens
  }

  test("every registered name resolves (registry round-trip)") {
    GraftFunctions.register(spark)
    for (name <- Seq("vec_dot", "vec_sq_dist", "vec_cosine", "vec_l2_norm", "vec_l2_dist",
        "quantize_int8", "dequant_int8", "token_count", "subword_count",
        "quality_score", "lang_guess", "doc_fingerprint", "char_jaccard",
        "simhash64", "redact_pii", "dup_token_ratio", "winnow_fp", "poly_hash",
        "soundex_code", "canonical_url",
        "top_k", "hll_sketch", "hll_merge", "hll_estimate", "freq_items",
        "cm_sketch", "cm_merge", "cm_query", "qs_sketch", "qs_merge",
        "qs_query", "funnel_stage", "token_windows", "content_chunks",
        "kmv_distinct"))
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name not registered")
  }

  test("sketch aggregates are callable from SQL and match the Column API") {
    GraftFunctions.register(spark)
    (1 to 300).map(i => s"u${i % 37}").toDF("v").createOrReplaceTempView("sk")
    val est = spark.sql(
      "SELECT hll_estimate(hll_sketch(v, 12)) AS e FROM sk").head.getLong(0)
    // linear-counting regime: near-exact (a single register collision
    // among 37 items in 4096 buckets shifts the estimate by ~1)
    assert(math.abs(est - 37L) <= 2L)
    val fi = spark.sql(
      "SELECT freq_items(v, 64) AS fi FROM sk").select(explode(col("fi")))
      .select("col.item", "col.cnt").collect()
    assert(fi.length == 37 && fi.map(_.getLong(1)).sum == 300L)
    // quantile sketch: n=100 < k=128 so no compaction fires and the
    // answer is exact — rank ceil(0.5·100) = 50 over values 1..100
    spark.range(1, 101)
      .selectExpr("CAST(id AS DOUBLE) AS x", "CAST(id % 4 AS INT) AS g")
      .createOrReplaceTempView("qs")
    val med = spark.sql(
      "SELECT qs_query(qs_sketch(x, 128), 0.5D) AS m FROM qs").head.getDouble(0)
    assert(med == 50.0)
    val mergedMed = spark.sql(
      """SELECT qs_query(qs_merge(sk, 128), 0.5D) AS m FROM
        |  (SELECT qs_sketch(x, 128) AS sk FROM qs GROUP BY g)""".stripMargin)
      .head.getDouble(0)
    assert(mergedMed == 50.0)
  }

  test("kmv_distinct is callable from SQL: exact below capacity") {
    GraftFunctions.register(spark)
    // 3-element sketch below k=8 -> exact 3.0
    assert(spark.sql(
      "SELECT kmv_distinct(array('aa', 'bb', 'cc'), 8) AS d")
      .head.getDouble(0) === 3.0)
  }

  test("content_chunks is callable from SQL and reconstructs the text") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT content_chunks('alpha beta gamma delta', 4, 3) AS c")
      .select(explode(col("c"))).select("col.start", "col.length", "col.chunk_text")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(got.map(_._3).mkString === "alpha beta gamma delta")
    assert(got.head._1 === 1)
    assert(spark.sql("SELECT content_chunks(NULL, 64, 32) AS c")
      .head.getSeq[Any](0).isEmpty)
  }

  test("poly_hash is callable from SQL and matches the left-fold definition") {
    GraftFunctions.register(spark)
    // "ab" -> (0*257 + 97)*257 + 98 = 25027 (mod 1e9+7 inert this small)
    assert(spark.sql("SELECT poly_hash('ab') AS h").head.getLong(0) == 25027L)
    assert(spark.sql("SELECT poly_hash('') AS h").head.getLong(0) == 0L)
  }

  test("canonical_url is callable from SQL and matches the Column rules") {
    GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT canonical_url('HTTPS://WWW.A.com:443//x/?utm_source=n&b=2&a=1#f') AS u")
      .head.getString(0) == "https://a.com/x?a=1&b=2")
    assert(spark.sql("SELECT canonical_url('junk') AS u").head.isNullAt(0))
  }

  test("funnel_stage and token_windows are callable from SQL and match the operators") {
    GraftFunctions.register(spark)
    // ordered type sequences, including a '|' injection attempt
    val st = spark.sql(
      """SELECT funnel_stage(array('view', 'x|click|y', 'click'),
        |                    array('view', 'click', 'purchase')) AS s""".stripMargin)
      .head.getInt(0)
    assert(st == 2, "view then click completes stage 2; the injected type is inert")
    assert(spark.sql(
      "SELECT funnel_stage(array('x|view|y'), array('view')) AS s").head.getInt(0) == 0)
    val chunks = spark.sql(
      "SELECT token_windows('a b c d e', 2, 1) AS w").select(explode(col("w")))
      .select("col.chunk_text").collect().map(_.getString(0)).toSeq
    // no trailing "e"-only window: it is wholly contained in "d e"
    assert(chunks == Seq("a b", "b c", "c d", "d e"))
  }
}
