package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical cross-engine probe: does `1/(1+exp(-t))` agree BITWISE
  * between the JVM and DuckDB over the fixed-point t space an operator
  * would feed it? Writes (t, IEEE bits) pairs computed by Spark's codegen
  * (java.lang.Math.exp) to parquet; tools/exp_probe.py recomputes in
  * DuckDB and diffs the bits. Diagnostic main, not part of the battery. */
object ExpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // t = e9-quantized doubles in [-30, 30] — the sigmoid's useful range
    val t = spark.range(2000000L).select(
      ((pmod(xxhash64(col("id")), lit(60000000001L)).cast("double") -
        lit(30000000000.0)) / lit(1.0e9)).as("t"))
    t.select(col("t"),
        (lit(1.0) / (lit(1.0) + exp(-col("t")))).as("p"))
      .write.mode("overwrite").parquet("/tmp/exp_jvm.parquet")
    spark.stop()
  }
}
