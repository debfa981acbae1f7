package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape audit over a set of battery queries: prints, per query,
  * the join/exchange operators in its formatted plan and flags the
  * anti-patterns the PLANS audits look for (CartesianProduct anywhere,
  * BroadcastNestedLoopJoin on a non-1-row side is judged manually from
  * the printed shapes). Usage:
  * `runMain graft.tools.PlanAudit <sfDir> <queryName...>` */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    wanted.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val lines = plan.split("\n").filter(l =>
          l.contains("Join") || l.contains("Exchange") ||
            l.contains("CartesianProduct") || l.contains("Window"))
          .map(_.replaceAll("\\(\\d+\\)", "").trim).distinct
        val cart = if (plan.contains("CartesianProduct")) " !!CARTESIAN" else ""
        println(s"== $name$cart")
        lines.foreach(l => println(s"   $l"))
      } catch { case e: Throwable =>
        println(s"== $name EXPLAIN-ERROR ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
