package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Skew-stress harness for the linear-candidate join families (q116
  * containment, q143 PassJoin edit distance): runs each operator over the
  * Zipf-skewed tables from tools/gen_skew.py and reports wall time, output
  * pairs, and the ACTUAL candidate row counts read off the executed plan's
  * join metrics — evidence for PLANS.md that the "linear candidates"
  * claims hold under head-heavy token distributions, not just the uniform
  * fixtures. Diagnostic main, not part of the battery. */
object SkewStress {

  private def joinRows(plan: SparkPlan): Seq[(String, Long)] = {
    val self = plan match {
      case a: AdaptiveSparkPlanExec => return joinRows(a.executedPlan)
      case p if p.nodeName.toLowerCase.contains("join") =>
        p.metrics.get("numOutputRows").map(m => (p.nodeName, m.value)).toSeq
      case _ => Seq.empty
    }
    self ++ plan.children.flatMap(joinRows) ++
      plan.subqueries.flatMap(joinRows)
  }

  private def run(name: String, df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    val result = df
    val n = result.count()
    val sec = (System.nanoTime() - t0) / 1e9
    // join metrics read only if the final plan exposes them (AQE keeps
    // the big SMJ inside collapsed query stages — counts come from
    // SkewProbe's analytic bucket sum instead)
    val joins = joinRows(result.queryExecution.executedPlan)
      .filter(_._2 > 0)
    val joinStr = if (joins.isEmpty) ""
      else joins.map { case (k, v) => s"$k=$v" }.mkString("  joins: ", ", ", "")
    println(f"[skew] $name%-32s ${sec}%7.1f s  output_pairs=$n%-10d$joinStr")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (level <- Seq("skew_mild", "skew_heavy")) {
      val docs = spark.read.parquet(s"testdata/$level/documents.parquet")
        .repartition(64) // single-file fixture: spread the cpu-heavy verify
        .localCheckpoint(true)
      println(s"--- $level: ${docs.count()} docs ---")
      run(s"$level editDistancePairs(40ch,salt=32)",
        Dedup.editDistancePairs(
          docs.select(col("doc_id"), substring(col("text"), 1, 40).as("key")),
          "doc_id", "key", maxDist = 2, salt = 32))
      run(s"$level containmentPairs(n=3)",
        Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
          threshold = 0.9, maxBucket = 64))
    }
    spark.stop()
  }
}
