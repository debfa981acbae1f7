package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn pairwise near-dup candidates (from
  * MinHash/SimHash/embedding scans) into connected components and pick one
  * canonical representative per component — the step between "found pairs"
  * and "deduplicated corpus".
  *
  * Components via iterative min-label propagation: every node starts
  * labeled with itself; each round it adopts the minimum label among
  * itself and its neighbors. Converges in graph-diameter rounds (dup
  * clusters are shallow in practice); each round is one join + aggregate,
  * checkpointed so lineage stays flat. No driver-side graph state — at
  * 100 TB the edge list never leaves the cluster.
  */
object DupClusters {

  /** Connected components over an (id_a, id_b) pair list. Returns
    * (id, cluster_id) where cluster_id = min id in the component. Only ids
    * appearing in pairs are returned (singletons are implicitly their own
    * cluster). */
  def components(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
    val sym = edges.unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("nl").as("min_nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("min_nbr"), col("label"))).as("label"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("label", "prev"), Seq("id"))
        .filter(col("label") =!= col("prev")).limit(1).isEmpty
      labels = next
      i += 1
    }
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Deduplicate `df`: keep the minimum-id row of every duplicate cluster
    * plus all rows never named in `pairs`. */
  def resolve(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = components(pairs)
    df.join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col(idCol))
      .drop("cluster_id")
  }
}
