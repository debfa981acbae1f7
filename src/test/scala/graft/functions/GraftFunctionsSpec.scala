package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

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

  test("vec_dot SQL rejects wrong arity") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] { spark.sql("SELECT vec_dot(array(1.0))").collect() }
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("vec_dot"))
  }

  test("GraftExtensions installs without error (spark-submit seam)") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }
}
