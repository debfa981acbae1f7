package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.sources.Tables

/** Convergence audit for the FIXED-round iterative graph operators —
  * answers "why is the battery's round count enough?" with measurements
  * instead of convention (the PageRank-delta pattern, applied to the
  * operators that lack a closed-form residual).
  *
  * The battery pins round counts (Louvain 3, LPA 3, HITS 2) because a
  * data-dependent stopping rule is NON-REPLAYABLE cross-engine: the
  * oracle would have to reproduce the same dynamic round count, and any
  * movement-threshold seam (count of changed labels, float residual)
  * becomes a new cross-engine surface. This probe measures, per round,
  * how much each operator's state still MOVES on the battery's own
  * graphs, so the fixed counts are documented as converged rather than
  * assumed. Diagnostic main, not part of the battery (results recorded
  * in PLANS.md):
  *
  *  - Louvain (q271's co-purchase graph): nodes that changed community
  *    per extra round, plus exact modularity Q·4m² after each count —
  *    movement without Q movement is label churn inside equal-Q optima;
  *  - LPA (q254's co-supplier graph): labels changed per extra round;
  *  - HITS (q248's buyer→supplier graph): L∞ and L1 movement of the
  *    e12 integer authority fixed-point per extra round.
  *
  * Each operator is DETERMINISTIC in its round count, so state at round
  * r is recovered exactly by re-running with `rounds = r` — O(R²) total
  * work, fine for a one-off probe.
  *
  * Usage: runMain graft.tools.ConvergenceProbe <sfDir> [maxRounds]
  */
object ConvergenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val maxRounds = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    // q271's graph: parts bought together (1-in-20 orders)
    val liP = t.lineitem.filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val coPurchase = liP.select(col("ok"), col("pk").as("a"))
      .join(liP.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct().localCheckpoint(true)

    // q254's graph: co-suppliers (directed both ways in the query; LPA
    // symmetrizes internally, so feed the canonical half)
    val liS = t.lineitem.filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val coSupplier = liS.select(col("ok"), col("sk").as("a"))
      .join(liS.select(col("ok"), col("sk").as("b")), "ok")
      .filter(col("a") =!= col("b"))
      .select("a", "b").localCheckpoint(true)

    // q248's graph: buyer -> supplier bipartite
    val bipartite = t.orders.filter(col("o_custkey") % 5 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t.lineitem.select(col("l_orderkey").as("o_orderkey"),
        (col("l_suppkey") + 1000000000L).as("supp")), Seq("o_orderkey"))
      .select(col("o_custkey").as("src"), col("supp").as("dst"))
      .localCheckpoint(true)

    def changed(prev: DataFrame, cur: DataFrame): Long =
      prev.select(col("node"), col("label").as("_p"))
        .join(cur, Seq("node"))
        .filter(col("label") =!= col("_p")).count()

    println(s"# convergence probe  sfDir=$sfDir  maxRounds=$maxRounds")

    println("## louvainMoveRounds (co-purchase graph, q271's level 1)")
    var prev: DataFrame = null
    (1 to maxRounds).foreach { r =>
      val cur = Graph.louvainMoveRounds(coPurchase, "a", "b", rounds = r)
        .localCheckpoint(true)
      val q = Graph.modularity(coPurchase, "a", "b", cur, "node", "label")
        .collect()(0)
      val moved = if (prev == null) -1L else changed(prev, cur)
      println(s"rounds=$r moved_vs_prev=$moved communities=" +
        s"${cur.select("label").distinct().count()} q_num_e=${q.getLong(3)}" +
        f" q=${q.getDouble(4)}%.6f")
      prev = cur
    }

    println("## labelPropagation (co-supplier graph, q254)")
    prev = null
    (1 to maxRounds).foreach { r =>
      val cur = Graph.labelPropagation(coSupplier, "a", "b", iters = r)
        .localCheckpoint(true)
      val moved = if (prev == null) -1L else changed(prev, cur)
      println(s"iters=$r moved_vs_prev=$moved communities=" +
        s"${cur.select("label").distinct().count()}")
      prev = cur
    }

    println("## hits (buyer->supplier bipartite, q248)")
    var prevH: DataFrame = null
    (1 to maxRounds).foreach { r =>
      val cur = Graph.hits(bipartite, "src", "dst", iters = r)
        .select(col("node"), col("authority_e12"), col("hub_e12"))
        .localCheckpoint(true)
      if (prevH != null) {
        val d = prevH.select(col("node"), col("authority_e12").as("_pa"),
            col("hub_e12").as("_ph"))
          .join(cur, Seq("node"))
          .agg(max(abs(col("authority_e12") - col("_pa"))).as("linf_a"),
            sum(abs(col("authority_e12") - col("_pa"))).as("l1_a"),
            max(abs(col("hub_e12") - col("_ph"))).as("linf_h"))
          .collect()(0)
        println(s"iters=$r linf_authority_e12=${d.getLong(0)} " +
          s"l1_authority_e12=${d.getLong(1)} linf_hub_e12=${d.getLong(2)}")
      } else println(s"iters=$r (baseline)")
      prevH = cur
    }
    spark.stop()
  }
}
