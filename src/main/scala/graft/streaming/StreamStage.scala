package graft.streaming

import java.nio.file.{Files, Path}
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Temp-dir plumbing for the file-source streaming gates (q238/q239/q253/
 * q270/...): the gates stage a batch DataFrame as parquet, stream it back
 * through `readStream`, and sink the result — all under /tmp.
 *
 * Two defects this fixes (round-13 verdict item #2):
 *
 *  1. '''Staging was inside the timed region.''' A bench iterates each
 *     query 3× and takes the min; re-writing the staged input every
 *     iteration made the streaming rows measure input-staging + stream
 *     instead of the stream. `stagedInput` writes once per (key, sfDir)
 *     per JVM and returns the cached path on re-invocation, so iterations
 *     2-3 (the ones the min-of-3 reports) time only the stream.
 *
 *  2. '''Temp dirs leaked.''' Each invocation created 3-4
 *     `Files.createTempDirectory` dirs with no cleanup — a 3-iteration
 *     bench over 4 streaming gates left ~40 staged-parquet/checkpoint
 *     dirs under /tmp. Every dir allocated here is registered with one
 *     JVM shutdown hook that deletes them recursively. Eager (pre-exit)
 *     deletion is NOT safe for sinks: the gate returns a lazy
 *     `spark.read.parquet(sink)` that the caller consumes after the gate
 *     function returns.
 *
 * Sink/checkpoint dirs stay FRESH per invocation (`tempDir`) — reusing a
 * sink across iterations would double rows under `mode("append")` if a
 * run retries. Only the staged input (immutable once written) is reused.
 */
object StreamStage {
  private val staged = mutable.Map[String, String]()
  private val cleanup = mutable.ArrayBuffer[Path]()
  private var hooked = false

  private def register(p: Path): Unit = synchronized {
    if (!hooked) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        cleanup.synchronized(cleanup.toList).foreach(deleteRecursively)))
      hooked = true
    }
    cleanup += p
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(c => deleteRecursively(c)) finally s.close()
      }
      Files.deleteIfExists(p): Unit
    } catch { case _: Throwable => () } // best-effort: never fail exit
  }

  /** Session clone whose shuffle/state parallelism derives from the STAGED
    * INPUT SIZE instead of the host core count (optimization guide §2:
    * partitioning must be scale-adaptive, not a constant tuned for either
    * local mode or the cluster). Stateful streaming gets NO AQE coalescing
    * (Spark disables AQE for stateful workloads), so every micro-batch
    * schedules one task AND commits one state-store delta file per shuffle
    * partition per stateful operator — a stream-stream join at the default
    * 32 partitions commits 4×32 store files per batch even when the staged
    * fixture is 2 MB. Partitions grow back linearly with input bytes
    * (`bytes / bytesPerPartition`, floor 2) and CAP at the session default,
    * so a cluster-sized input keeps the configured parallelism and only the
    * small-input regime sheds the empty-state overhead.
    *
    * `newSession()` (not a conf mutation) keeps this race-free under
    * Verify's concurrent query threads: the clone shares the SparkContext
    * but owns its SQLConf. Results are partition-count-invariant (keyed
    * aggregations/joins; every gate's readback ends in a total ORDER BY). */
  def scaledSession(s: SparkSession, inputs: Seq[String],
                    bytesPerPartition: Long = 8L << 20): SparkSession = {
    val cur = s.sessionState.conf.numShufflePartitions
    val bytes = inputs.map { p =>
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
      } catch { case _: Throwable => 0L }
    }.sum
    val derived =
      math.min(cur.toLong, math.max(2L, bytes / bytesPerPartition + 1)).toInt
    if (derived >= cur) s
    else {
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", derived.toString)
      ss
    }
  }

  /** Fresh temp dir, deleted at JVM exit. */
  def tempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    register(p)
    p.toString
  }

  /**
   * Stage `df` as parquet, once per (key, token) per JVM; later calls
   * with the same key+token reuse the staged copy. `token` should
   * identify the input (the sf dir), so different scale factors never
   * collide. With the default `nFiles = 1` the file source sees ONE
   * file -> the AvailableNow trigger sees exactly one micro-batch, so
   * within-batch order is the global order; gates that exercise
   * MULTI-batch semantics (e.g. the CDC upsert) stage `nFiles > 1` and
   * pair it with `maxFilesPerTrigger = 1` — batch boundaries are then
   * file-arbitrary, so only use it where the final result is invariant
   * to the batch split (version-based merges are).
   */
  def stagedInput(key: String, token: String, df: => DataFrame,
                  nFiles: Int = 1): String =
    synchronized {
      staged.getOrElseUpdate(s"$key|$token", {
        val p = tempDir(s"graft_${key}_in")
        val d = df
        val shaped = if (nFiles == 1) d.coalesce(1) else d.repartition(nFiles)
        shaped.write.mode("overwrite").parquet(p)
        p
      })
    }

  /**
   * Stage an ORDERED sequence of inputs, one subdirectory per part,
   * written sequentially so the file-source's (mtime, path) ordering
   * replays them as micro-batches in EXACTLY this order under
   * `maxFilesPerTrigger = 1` (subdir names are ZERO-PADDED — p000 <
   * p001 < … — so the lexicographic mtime tie-break equals numeric
   * order at any part count; bare p10 would sort before p2). Use where
   * batch CONTENT must be controlled —
   * e.g. sentinel batches that advance the watermark past the real
   * data so append-mode state flushes deterministically. Read with
   * `readStream.parquet` over the `dir + "/" + "*"` glob plus
   * pathGlobFilter "*.parquet".
   * Cached once per (key, token) per JVM like [[stagedInput]].
   */
  def stagedInputParts(key: String, token: String,
                       parts: Seq[() => DataFrame]): String =
    synchronized {
      staged.getOrElseUpdate(s"$key|$token", {
        val p = tempDir(s"graft_${key}_in")
        parts.zipWithIndex.foreach { case (df, i) =>
          df().coalesce(1).write.mode("overwrite").parquet(f"$p/p$i%03d")
        }
        p
      })
    }
}
