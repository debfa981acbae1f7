package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn pairwise near-dup candidates (from
  * MinHash/SimHash/embedding scans) into connected components and pick one
  * canonical representative per component — the step between "found pairs"
  * and "deduplicated corpus".
  *
  * Components via min-label propagation with pointer jumping: every node
  * starts labeled with itself; each round it (1) adopts the minimum label
  * among itself and its neighbors, then (2) jumps to its label's label
  * (path halving). Propagation alone needs graph-diameter rounds; the jump
  * step composes label chains, so a diameter-d chain converges in O(log d)
  * rounds — each round two joins + an aggregate, checkpointed so lineage
  * stays flat. No driver-side graph state — at 100 TB the edge list never
  * leaves the cluster.
  *
  * Materialization is `localCheckpoint`: executor-stored, lineage
  * truncated. Acceptable here because components is a pure derivation —
  * an executor loss mid-run kills the job but no state, and a rerun
  * rebuilds everything from the (still intact) inputs. Read-modify-write
  * callers need durable staging instead (see MergeByKey).
  */
object DupClusters {

  /** Connected components over an (id_a, id_b) pair list — ids keep their
    * natural type (anything with a total order; min/least drive the
    * labels). Returns (id, cluster_id) where cluster_id = min id in the
    * component. Only ids appearing in pairs are returned (singletons are
    * implicitly their own cluster). Throws if the fixpoint isn't reached
    * within `maxIters` — returning unconverged labels would let duplicates
    * silently survive. */
  def components(pairs: DataFrame, maxIters: Int = 20): DataFrame =
    componentsWithRounds(pairs, maxIters)._1

  /** [[components]] plus the number of rounds it took — the convergence
    * contract (O(log diameter), thanks to pointer jumping) is asserted by
    * DupClustersSpec against deep chains. */
  def componentsWithRounds(pairs: DataFrame, maxIters: Int = 20): (DataFrame, Int) = {
    // symmetrize via a per-row explode, not union(edges, edges.swap): the
    // union shape executes the (possibly expensive — MinHash, cosine scan)
    // pair-producing subplan TWICE, the explode runs it once
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("nl").as("min_nbr"))
      // checkpoint before the self-join below: a self-join re-executes its
      // subplan (no exchange reuse), which would double every round's
      // join+agg; against the checkpoint it's two cached-block scans.
      // LAZY (eager=false): an eager checkpoint is its own job, and at
      // per-round granularity job-launch overhead dominates — the first
      // stage that reads `prop` materializes it, the sibling stage reuses.
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), coalesce(col("min_nbr"), col("label"))).as("label"))
        .localCheckpoint(false)
      // pointer jump: label ← label(label). Labels only ever decrease and
      // stay within the component (label(x) ≤ x by induction), so the jump
      // preserves the fixpoint while halving chain depth each round —
      // this is what turns diameter-d convergence into O(log d).
      // one checkpoint per round holds (prev, next) side by side; lazy —
      // the convergence probe below is the action that materializes it, and
      // the next round's joins then read the cached blocks. Dropped
      // generations are reclaimed by the ContextCleaner once dereferenced.
      val step = prop
        .join(prop.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"), col("prev"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint(false)
      converged = step.filter(col("label") =!= col("prev")).limit(1).isEmpty
      labels = step.drop("prev")
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"components did not converge in $maxIters iterations — raise maxIters " +
          "(graph diameter exceeds it)")
    (labels.withColumnRenamed("label", "cluster_id"), i)
  }

  /** Deduplicate `df`: keep ONE surviving row per duplicate cluster (the
    * minimum id actually present in `df` — a cluster whose global min was
    * deleted upstream still keeps a representative) plus all rows never
    * named in `pairs`. */
  def resolve(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = components(pairs).withColumnRenamed("id", idCol)
    val keep = comp.join(df.select(idCol), Seq(idCol)) // ids that still exist
      .groupBy("cluster_id").agg(min(idCol).as("_keep_id"))
    df.join(comp, Seq(idCol), "left")
      .join(keep, Seq("cluster_id"), "left")
      .filter(col("cluster_id").isNull || col(idCol) === col("_keep_id"))
      .drop("cluster_id", "_keep_id")
  }
}
