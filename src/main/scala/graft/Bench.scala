package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** One benched query's measurement window. `time` is the min of three
    * timed runs; the window stats localize contamination to the queries
    * whose window was dirty instead of condemning the whole artifact. */
  private case class QR(name: String, time: Double, ok: Boolean,
                        off: Double, la: Double, ext: Double,
                        sysR: Double, iowR: Double, gcSec: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg: Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def processCpuSec: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    // own-JVM cumulative GC seconds: a query window spent collecting is SELF
    // contamination the user-jiffy external-load detector can't see (r15:
    // the artifact stamped suspect_n:0 while carrying 8x-inflated numbers).
    def gcTotalSec: Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum / 1000.0
    }
    // warm up codegen/parquet-reader/shuffle machinery so per-query numbers
    // measure the engine, not JVM class loading (first query otherwise
    // absorbs ~5s of one-time cost)
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    // The timed action is a noop-sink write, NOT count(): under count()
    // Catalyst elides the final global sort every battery query ends in, so
    // ordered queries would under-measure; the noop sink consumes fully
    // ordered rows and writes nothing.
    // Three timed runs per query, report the min: later runs measure the
    // engine with codegen caches warm — the steady state a long-lived
    // cluster sees — and the min of three is robust against the one-off
    // scheduling/GC stalls that made single-run deltas majority-noise
    // across driver rounds.
    // Host-load evidence (round 9: two of the last three driver benches were
    // contention-contaminated and only a judge re-bench could tell). Stamp
    // 1-minute loadavg before/after the battery plus this JVM's cpu-vs-wall
    // ratio: loadavg >> cpus or ratio << 1 on a compute-bound battery says
    // "read these numbers as an upper bound", right in the artifact.
    // Wait-for-quiet (round 11): three of four driver benches were
    // co-tenant-contaminated — the stamp made that READABLE, this makes
    // the artifact CLEAN when possible. Bounded: poll the 1-minute
    // loadavg until it drops under cpus/4, give up after 5 minutes and
    // proceed with an explicit "contended": true so a dirty run can
    // never masquerade as a clean one.
    // Threshold history: cpus/4 (= 8 at local[32]) passed the round-12
    // driver run at loadavg 5.15 as "clean" while its totals were ~1.8x
    // the clean anchor — ~5 co-tenant cores is material contamination on
    // a 32-cpu host. max(2.0, cpus/16) keeps small-cpu runs workable and
    // flags anything beyond ~2 busy cores on the big host.
    val quietThreshold = math.max(2.0, cpus.toDouble / 16.0)
    val waitDeadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
    var waitedSec = 0.0
    while (loadavg >= quietThreshold && System.nanoTime() < waitDeadline) {
      Thread.sleep(5000)
      waitedSec += 5.0
    }
    val contended = loadavg >= quietThreshold
    val loadBefore = loadavg
    val cpuBefore = processCpuSec
    val wallStart = System.nanoTime()
    val epoch0 = System.currentTimeMillis() / 1000
    // optional args: query names to bench (default all) — iteration aid
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => args.isEmpty || args.contains(name) }
    // SELF-RECHECK ANCHOR (round 16): the per-query external-load detector
    // below measures co-tenant USER cpu only — page-cache eviction, iowait
    // and own-GC pressure are invisible to it, and BENCH_r15.json shipped
    // q73 at 34.51s (clean: 4.3-4.5s) under suspect_n:0. The fix is a
    // committed CLEAN per-query anchor: any query whose min-of-3 exceeds
    // ~2x its anchor gets ONE end-of-battery re-measure (after a bounded
    // quiet wait), and the artifact's final number is the min — so a
    // transiently dirty window can no longer stamp a phantom regression
    // into the artifact. Format: {"sf":"sf0.1","queries":{"<name>":sec}}.
    // The anchor only applies when its sf matches this run's; unknown
    // queries (new this round) simply have no anchor and never recheck.
    val anchorPath = sys.env.getOrElse("SPARK_GRAFT_ANCHOR", "tools/bench_anchor.json")
    val sfBase = new java.io.File(sfDir).getName
    val anchor: Map[String, Double] =
      try {
        val txt = {
          val src = scala.io.Source.fromFile(anchorPath)
          try src.mkString finally src.close()
        }
        val sfOk = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt)
          .exists(_.group(1) == sfBase)
        if (!sfOk) Map.empty
        else "\"(q[0-9][^\"]*)\"\\s*:\\s*([0-9][0-9.]*)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    // Per-query external-load measurement. History: a raw loadavg
    // threshold flags most of any busy battery (r12: clean run
    // self-flags 10/12); subtracting own-JVM cpu via a sliding window
    // under-subtracts against loadavg's EMA (r13: judge-clean run
    // self-flags 8/20); simulating the kernel's EMA over own cpu still
    // false-flags after disk-heavy queries, because loadavg counts
    // D-state tasks and kworkers that accrue no process cpu (r14
    // dry-run: a quiet host self-flagged 37 right after the streaming
    // gates). Fix: stop inferring from loadavg — measure external cpu
    // DIRECTLY from /proc/stat deltas over each query's own window:
    // ext ≈ (host USER jiffies − own process cpu) / wall. USER time
    // only, because sandboxed hosts run filesystem daemons whose
    // SYSTEM time scales with OUR OWN io (measured here: the streaming
    // gates drive ~3 cores of out-of-process system time on an
    // otherwise idle box) — a co-tenant's compute is user time, our
    // io side-effects are kernel time, and only the former is
    // contamination to flag. Own process cpu includes our system
    // time, so the subtraction is conservative (never over-flags).
    // SYSTEM and IOWAIT jiffies are now RECORDED per window too (r16):
    // they don't feed the suspect flag (own-IO scales them), but a
    // reader adjudicating a slow query can see whether its window was
    // kernel/io-bound — the r15 blind spot, made visible.
    // USER_HZ is 100 on linux (the only platform with /proc/stat).
    def hostStat: (Double, Double, Double) =
      try {
        val parts = {
          val src = scala.io.Source.fromFile("/proc/stat")
          try src.getLines().next().trim.split("\\s+").drop(1).map(_.toDouble)
          finally src.close()
        }
        // user nice system idle iowait ...
        ((parts(0) + parts(1)) / 100.0, parts(2) / 100.0, parts(4) / 100.0)
      } catch { case _: Throwable => (-1.0, -1.0, -1.0) }
    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                runs: Int): QR = {
      var ok = true
      val startOffset = (System.nanoTime() - wallStart) / 1e9
      val loadAtStart = loadavg
      val (busy0, sys0, iow0) = hostStat
      val cpu0 = processCpuSec
      val gc0 = gcTotalSec
      val t0q = System.nanoTime()
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => ok = false }
        (System.nanoTime() - t0) / 1e9
      }
      val wallQ = math.max((System.nanoTime() - t0q) / 1e9, 1e-3)
      val (busy1, sys1, iow1) = hostStat
      val extLoad =
        if (busy0 < 0) math.max(loadavg - cpus.toDouble, 0.0) // no /proc
        else math.max((busy1 - busy0) - (processCpuSec - cpu0), 0.0) / wallQ
      val sysR = if (sys0 < 0) -1.0 else (sys1 - sys0) / wallQ
      val iowR = if (iow0 < 0) -1.0 else (iow1 - iow0) / wallQ
      QR(name, times.min, ok, startOffset, loadAtStart, extLoad,
        sysR, iowR, gcTotalSec - gc0)
    }
    val measured = wanted.map { case (name, fn) => measure(name, fn, 3) }
    // END-OF-BATTERY SELF-RECHECK: re-measure (min-of-2, after a bounded
    // quiet wait) every anchored query whose min-of-3 exceeded
    // max(2x anchor, anchor + 0.5s) — the absolute floor keeps sub-second
    // queries' scheduling jitter from triggering re-runs. The final
    // artifact number is min(battery, recheck); both readings are emitted
    // so the correction is auditable, never silent.
    val flagged = measured.filter { r =>
      r.ok && anchor.get(r.name).exists(a => r.time > math.max(2 * a, a + 0.5))
    }.take(40)
    val recheckWaitDeadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    if (flagged.nonEmpty)
      while (loadavg >= quietThreshold && System.nanoTime() < recheckWaitDeadline)
        Thread.sleep(5000)
    val fnByName = wanted.toMap
    val recheckedTimes: Map[String, Double] = flagged.map { r =>
      r.name -> measure(r.name, fnByName(r.name), 2).time
    }.toMap
    val results = measured.map { r =>
      recheckedTimes.get(r.name) match {
        case Some(t2) if t2 < r.time => r.copy(time = t2)
        case _ => r
      }
    }
    // Output protocol (round 8): the driver captures only the LAST ~3 KB of
    // the run's stdout, and a single full-battery JSON line (~3.8 KB at 108
    // queries) overflowed it every round — the line's head (and with it the
    // opening brace) was cut, so the driver recorded parsed:null. Emit
    // instead: (a) per-query maps with FULL query names split across
    // several lines, each comfortably under the window, then (b) the
    // summary as the LAST line, which alone carries a complete per-query
    // map under compact keys — the unique "qNN" prefix of each query name
    // (q01..q108; q10 vs q100 are distinct prefixes). Even if truncation
    // eats every part line, the final line reconstructs the whole battery.
    def fmt(v: Double): String = f"$v%.2f"
    def chunked(entries: Seq[String], cap: Int): Vector[Vector[String]] =
      entries.foldLeft(Vector(Vector.empty[String])) { (acc, e) =>
        if (acc.last.map(_.length + 1).sum + e.length > cap) acc :+ Vector(e)
        else acc.init :+ (acc.last :+ e)
      }
    // failed queries are named explicitly so a fast failure can never
    // masquerade as a fast success
    val failed = results.filterNot(_.ok).map(r => "\"" + r.name + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_.time).sum
    // per-query window stats: [start offset sec, 1-min loadavg at start,
    // EXTERNAL user-cpu load, system jiffies/sec, iowait jiffies/sec,
    // own-JVM gc sec] — partial contamination is localizable to the
    // queries whose window was dirty, in any of the three dimensions
    val loadEntries = results.map { r =>
      "\"" + r.name.takeWhile(_ != '_') + "\":[" + fmt(r.off) + "," +
        fmt(r.la) + "," + fmt(r.ext) + "," + fmt(r.sysR) + "," +
        fmt(r.iowR) + "," + fmt(r.gcSec) + "]"
    }
    chunked(loadEntries, 2000).zipWithIndex.foreach { case (chunk, i) =>
      val m = chunk.mkString("{", ",", "}")
      println(s"""{"metric":"bench_query_load","part":${i + 1},"of":${chunked(loadEntries, 2000).size},"epoch0":$epoch0,"start_loadavg":$m}""")
    }
    val entries = results.map(r => "\"" + r.name + "\":" + fmt(r.time))
    // greedy chunking keeps every part line < ~2.2 KB regardless of how
    // many queries future rounds add
    val parts = chunked(entries, 2000)
    parts.zipWithIndex.foreach { case (chunk, i) =>
      val m = chunk.mkString("{", ",", "}")
      println(s"""{"metric":"bench_part","part":${i + 1},"of":${parts.size},"queries":$m}""")
    }
    // compact per-query map under unique "qNN" prefixes — the reconstruct-
    // everything fallback line. It is NOT the last line: at 174 queries it
    // runs ~2.5 KB, and the driver keeps only the last ~2 KB of stdout, so
    // whatever line carries it gets its HEAD sliced off. Three consecutive
    // driver artifacts (r9-r11) recorded parsed:null because the summary
    // and this map shared one line. Chunk it like the full-name parts so
    // every line stays under the window.
    val compactEntries = results.map { r =>
      "\"" + r.name.takeWhile(_ != '_') + "\":" + fmt(r.time)
    }
    val compactParts = chunked(compactEntries, 1500)
    compactParts.zipWithIndex.foreach { case (chunk, i) =>
      val m = chunk.mkString("{", ",", "}")
      println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","part":${i + 1},"of":${compactParts.size},"sf":"$sfDir","queries":$m}""")
    }
    // the recheck audit trail: battery reading -> recheck reading per
    // flagged query, chunked like everything else
    if (flagged.nonEmpty) {
      val rEntries = flagged.map { r =>
        "\"" + r.name.takeWhile(_ != '_') + "\":[" + fmt(r.time) + "," +
          fmt(recheckedTimes(r.name)) + "]"
      }
      chunked(rEntries, 1500).zipWithIndex.foreach { case (chunk, i) =>
        val m = chunk.mkString("{", ",", "}")
        println(s"""{"metric":"bench_recheck","part":${i + 1},"of":${chunked(rEntries, 1500).size},"battery_then_recheck":$m}""")
      }
    }
    // Per-query contamination localization: queries whose estimated
    // EXTERNAL load (end-of-query loadavg minus own-JVM EMA) exceeded the
    // quiet threshold. The FULL suspect list is emitted as chunked
    // bench_suspect part lines (the bench_part pattern — round 13 capped
    // the summary at 40 names and the driver's stdout tail dropped the
    // rest); the summary keeps a bounded 40-name preview + the true count.
    val suspectAll = results.filter(_.ext >= quietThreshold)
      .map(r => "\"" + r.name.takeWhile(_ != '_') + "\"")
    if (suspectAll.nonEmpty) {
      chunked(suspectAll, 1500).zipWithIndex.foreach { case (chunk, i) =>
        val m = chunk.mkString("[", ",", "]")
        println(s"""{"metric":"bench_suspect","part":${i + 1},"of":${chunked(suspectAll, 1500).size},"suspect":$m}""")
      }
    }
    val suspect = suspectAll.take(40).mkString("[", ",", "]")
    // Headline verdict from the WHOLE run, not just the start (round 13:
    // a run with 89/278 suspect queries still stamped contended:false):
    // dirty_mid_run when suspects exceed max(3, 5% of the battery), and
    // `contended` — the field readers key on — is the OR of both signals.
    val dirtyMidRun = suspectAll.size > math.max(3, results.size / 20)
    val contendedAny = contended || dirtyMidRun
    // stamp the scanned commit so the artifact is verifiable against the
    // diff it covers (best-effort: blank outside a git checkout)
    val gitSha =
      try scala.sys.process.Process(Seq("git", "rev-parse", "HEAD"),
        new java.io.File(".")).!!.trim.take(40)
      catch { case _: Throwable => "" }
    val wallSec = (System.nanoTime() - wallStart) / 1e9
    val cpuSec = processCpuSec - cpuBefore
    // ratio is per-core occupancy of THIS jvm: ≈0 means the battery waited
    // on something else (co-tenant), ≈1+ means it actually computed
    val ratio = if (cpuSec >= 0 && wallSec > 0) cpuSec / wallSec else -1.0
    // Optional anchor refresh: SPARK_GRAFT_ANCHOR_OUT writes this run's
    // final per-query numbers as the next anchor — REFUSED on a contended
    // run, so a dirty battery can never become the baseline future runs
    // recheck against.
    sys.env.get("SPARK_GRAFT_ANCHOR_OUT").foreach { outPath =>
      if (contendedAny)
        System.err.println(s"[bench] NOT writing anchor to $outPath: run was contended")
      else {
        val w = new java.io.PrintWriter(outPath, "UTF-8")
        try {
          w.println("{\"sf\":\"" + sfBase + "\",\"git_sha\":\"" + gitSha + "\",\"queries\":{")
          w.println(results.map(r => "  \"" + r.name + "\":" + fmt(r.time))
            .mkString(",\n"))
          w.println("}}")
        } finally w.close()
      }
    }
    // The absolutely LAST line is a FIXED-SIZE summary with no per-query
    // map — total/failed/contended/loadavg in ~300 bytes, so the driver's
    // stdout tail always captures it whole no matter how many queries
    // future rounds add. Per-query numbers live in the bench_part /
    // chunked total lines above.
    println(s"""{"metric":"bench_summary","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":$failed,"sf":"$sfDir","loadavg_before":${fmt(loadBefore)},"loadavg_after":${fmt(loadavg)},"cpus":$cpus,"wall_sec":${fmt(wallSec)},"jvm_cpu_sec":${fmt(cpuSec)},"jvm_cpu_per_sec":${fmt(ratio)},"contended":$contendedAny,"contended_at_start":$contended,"dirty_mid_run":$dirtyMidRun,"waited_for_quiet_sec":${fmt(waitedSec)},"quiet_threshold":${fmt(quietThreshold)},"suspect_n":${suspectAll.size},"suspect":$suspect,"anchored_n":${anchor.size},"rechecked_n":${flagged.size},"rechecked":${flagged.map(r => "\"" + r.name.takeWhile(_ != '_') + "\"").take(20).mkString("[", ",", "]")},"git_sha":"$gitSha"}""")
    spark.stop()
  }
}
