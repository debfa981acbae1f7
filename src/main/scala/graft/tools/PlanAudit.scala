package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of named SparkEntry queries — the
  * "would this plan survive a 100× scale-up" review loop, as a repeatable
  * diagnostic main (the AnalyticsSkewProbe convention).
  *
  * Usage: `runMain graft.tools.PlanAudit q287_nb_multiclass …`
  * (env `SPARK_GRAFT_SF_DIR` picks the tables; default sf0.01).
  * Diagnostic main, not part of the battery. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      println(s"\n===== $name =====")
      qs.get(name) match {
        case Some(q) => println(q(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"unknown query $name")
      }
    }
    spark.stop()
  }
}
