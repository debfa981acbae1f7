package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Linkage, Sessionize}

/** Skew-stress harness for the round-11 analytics family (VERDICT r11
  * "Next round" #4): `Linkage.blockedPairs` under Zipf-skewed blocking
  * values and `Sessionize.transitionMatrix` under a firehose user.
  *
  * Linkage: blocking values are the first/second tokens of the
  * tools/gen_skew.py documents (5000-token vocabulary, Zipf a=1.3 mild /
  * a=2.0 heavy — the heavy head token draws ~60% of rows, so an uncapped
  * head block would emit depth²/2 candidate pairs). Reports the analytic
  * candidate count WITH and WITHOUT the maxBucket cap (computed off block
  * depths, no join), then times the real operator at two cap levels.
  *
  * Transition matrix: synthesized event streams (deterministic id
  * arithmetic, no fixtures needed) at two shapes — uniform (10k users,
  * balanced) and firehose (ONE user carries 50% of all events, the
  * bot-traffic shape). The firehose user's lead() window is a single
  * task by construction; this measures what that task costs.
  *
  * Diagnostic main, not part of the battery. */
object AnalyticsSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%.1f s  rows=$c")
    }

    // --- round-12 third session: itemNeighbors under a firehose basket
    // (`runMain … items` runs only this section). 200k interactions of
    // 20k normal users × 10 items, plus ONE crawler account holding
    // `fh` distinct items: uncapped it contributes fh² pair instances
    // (25M at fh=5000) that carry no signal; the basket cap drops the
    // account whole.
    // --- round-15: IVFADC serving under a HOT CELL (`runMain … ivfpq`).
    // 100k 64-dim vectors; hotPct% collapse into one tight blob (the
    // ingest-drift shape cellLoad's rebuild_hint exists for), queries
    // target the blob at nProbe = 1 — the worst serve: every probe
    // lands in the one overloaded cell. The claim under test: ADC cost
    // scales LINEARLY with probed postings (broadcast LUT join +
    // map-side-combined sums; a heavy cell_id key splits under AQE),
    // so a 9× hotter cell costs ~9× one balanced cell and nothing
    // quadratic appears. Index build (untimed) via saveIvfPqIndex;
    // the timed region is topKFromIvfPqIndex alone — the serve path.
    if (args.contains("ivfpq")) {
      import graft.operators.Pq
      val dim = 64
      for (hotPct <- Seq(0, 50, 90)) {
        val vecs = spark.range(100000L).select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(dim)), j =>
            when(pmod(col("id"), lit(100L)) < hotPct,
              lit(1000.0) + pmod(xxhash64(col("id") * lit(dim) + j),
                lit(1000L)).cast("double") / lit(1000.0))
              .otherwise(pmod(xxhash64(col("id") * lit(dim) + j),
                lit(20000L)).cast("double"))).as("embedding"))
          .localCheckpoint(true)
        val path = s"/tmp/graft_probe_ivfpq_$hotPct"
        Pq.saveIvfPqIndex(path, vecs, "vec_id", "embedding", dim = dim,
          m = 4, kCells = 16, nCells = 16, iters = 2)
        val q = (if (hotPct == 0) vecs
                 else vecs.filter(pmod(col("vec_id"), lit(100L)) < hotPct))
          .limit(8)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
          .localCheckpoint(true)
        timed(s"ivfpq serve hotPct=$hotPct nProbe=1")(
          Pq.topKFromIvfPqIndex(spark, path, vecs, "vec_id", "embedding",
            q, k = 10, nProbe = 1, shortlistFactor = 4).count())
      }
      spark.stop(); return
    }

    if (args.contains("items")) {
      import graft.operators.Similarity
      for (fh <- Seq(0L, 2000L, 5000L)) {
        val normal = spark.range(200000L).select(
          (col("id") % 20000L).as("u"), (col("id") % 997L).as("i"))
        val inter = if (fh == 0L) normal else normal.unionByName(
          spark.range(fh).select(lit(999999L).as("u"),
            (col("id") + 10000L).as("i")))
        val pinned = inter.repartition(64).localCheckpoint(true)
        timed(s"itemNeighbors fh=$fh cap=1000 (drops it)")(
          Similarity.itemNeighbors(pinned, "u", "i", k = 5, minCo = 2L,
            maxBasket = 1000).count())
        timed(s"itemNeighbors fh=$fh cap=100000 (keeps it)")(
          Similarity.itemNeighbors(pinned, "u", "i", k = 5, minCo = 2L,
            maxBasket = 100000).count())
      }
      spark.stop(); return
    }

    // --- round-14: exactSubstringRemovals under a VIRAL boilerplate
    // gram (`runMain … exact` runs only this section; VERDICT r13 #5).
    // 1M synthetic 30-token docs; a `frac` fraction carries one shared
    // 25-token boilerplate prefix, so ONE gram key holds frac·1M rows on
    // the wins⋈canon join — the q237 scaladoc claims AQE skew-split +
    // partial aggregation absorb it; this measures the claim. The
    // remaining 5 (plain: 30) tokens are id-unique, so per-doc window
    // work is identical across regimes and only the key distribution
    // changes.
    if (args.contains("exact")) {
      import graft.operators.Dedup
      val boiler = (1 to 25).map(i => s"boiler$i").mkString(" ")
      for (frac <- Seq(0, 10, 50)) {
        val uniq = concat_ws(" ",
          (0 until 30).map(j => concat(lit(s"u${j}x"), col("id"))): _*)
        val docs = spark.range(1000000L).select(col("id").as("doc_id"),
          when(col("id") % 100 < frac,
            concat_ws(" ", lit(boiler),
              concat_ws(" ", (0 until 5).map(j =>
                concat(lit(s"u${j}x"), col("id"))): _*)))
            .otherwise(uniq).as("text"))
          .repartition(64).localCheckpoint(true)
        timed(s"exactSubstringRemovals viral=$frac%")(
          Dedup.exactSubstringRemovals(docs, "doc_id", "text", k = 25)
            .count())
      }
      spark.stop(); return
    }

    // --- round-14: linkPrediction under a celebrity hub (`runMain …
    // links` runs only this section). Base graph: the functional graph
    // a → 7a+1 mod 50000 (50k distinct edges after dedup, degree ~2 —
    // deliberately THIN so the hub term is the whole signal). The hub
    // regime adds ONE node
    // adjacent to `hubDeg` others: as a wedge CENTER it would emit
    // hubDeg²/2 candidate pairs of meaningless weak ties, so
    // maxCenterDegree = 256 drops it whole (its endpoints still pair
    // through their bounded-degree shared neighbors); the keeps-it cap
    // measures what the dropped work would have cost.
    if (args.contains("links")) {
      import graft.operators.Graph
      for (hubDeg <- Seq(0L, 2000L, 10000L)) {
        val base = spark.range(200000L).select(
          (col("id") % 50000L).as("a"), ((col("id") * 7L + 1L) % 50000L).as("b"))
        val edges = if (hubDeg == 0L) base else base.unionByName(
          spark.range(hubDeg).select(lit(999999L).as("a"), col("id").as("b")))
        val pinned = edges.repartition(64).localCheckpoint(true)
        timed(s"linkPrediction hub=$hubDeg cap=256 (drops it)")(
          Graph.linkPrediction(pinned, "a", "b", maxCenterDegree = 256,
            minCommon = 2L).count())
        timed(s"linkPrediction hub=$hubDeg cap=100000 (keeps it)")(
          Graph.linkPrediction(pinned, "a", "b", maxCenterDegree = 100000,
            minCommon = 2L).count())
      }
      spark.stop(); return
    }

    // --- round-14: betweennessFromLandmarks under a celebrity hub
    // (`runMain … btw` runs only this section). Same thin functional
    // base graph as `links`; the hub regime wires node 999999 to
    // `hubDeg` others (every landmark hub-adjacent) and
    // puts a landmark ONE hop away, so the hub lands in an early BFS
    // frontier and its full adjacency fans out in that round's
    // frontier⋈edges join (σ sums are map-side combined; the claim
    // under test is that the round is join-bounded, not hub²).
    if (args.contains("btw")) {
      import graft.operators.Graph
      for (hubDeg <- Seq(0L, 10000L, 40000L)) {
        val base = spark.range(200000L).select(
          (col("id") % 50000L).as("a"), ((col("id") * 7L + 1L) % 50000L).as("b"))
        val edges = if (hubDeg == 0L) base else base.unionByName(
          spark.range(hubDeg).select(lit(999999L).as("a"), col("id").as("b")))
        val pinned = edges.repartition(64).localCheckpoint(true)
        timed(s"betweenness hub=$hubDeg, landmark 1 hop from hub")(
          Graph.betweennessFromLandmarks(pinned, "a", "b",
            Seq(0L, 101L, 202L, 303L), maxHops = 3).count())
      }
      spark.stop(); return
    }

    // --- round-13 second wave: dbscan under a dense blob and
    // labelPropagation under a celebrity hub (`runMain … spatial` runs
    // only this section). DBSCAN's grid join degrades to the dense
    // cell's LOCAL pair product (the operator's inherent output bound);
    // LPA's hub is a heavy reduce key absorbed by partial aggregation —
    // these measure what each regime actually costs.
    if (args.contains("spatial")) {
      import graft.operators.{Graph, Spatial}
      def uniPts(n: Long) = spark.range(n).select(col("id").as("pid"),
        pmod(col("id") * 2654435761L, lit(10000000L)).as("x"),
        pmod(col("id") * 2246822519L, lit(10000000L)).as("y"))
      val uni = uniPts(50000L).repartition(64).localCheckpoint(true)
      timed("dbscan uniform 50k eps=1e5 minPts=8")(
        Spatial.dbscan(uni, "pid", "x", "y", 100000L, 8).count())
      // 5k points crammed inside ONE eps-cell (the dense-blob regime:
      // ~25M local candidate pairs by construction) + 45k uniform
      val blob = spark.range(5000L).select((col("id") + 1000000L).as("pid"),
          pmod(col("id") * 131L, lit(100000L)).as("x"),
          pmod(col("id") * 137L, lit(100000L)).as("y"))
        .unionByName(uniPts(45000L))
        .repartition(64).localCheckpoint(true)
      timed("dbscan dense-blob 5k-in-one-cell + 45k")(
        Spatial.dbscan(blob, "pid", "x", "y", 100000L, 8).count())
      val star = spark.range(500000L)
        .select(lit(0L).as("a"), (col("id") + 1L).as("b"))
        .repartition(64).localCheckpoint(true)
      timed("labelPropagation star hub-500k iters=3")(
        Graph.labelPropagation(star, "a", "b", 3).count())
      val rnd = spark.range(500000L)
        .select(pmod(col("id") * 7919L, lit(100000L)).as("a"),
          pmod(col("id") * 104729L, lit(100000L)).as("b"))
        .repartition(64).localCheckpoint(true)
      timed("labelPropagation uniform 500k/100k-node iters=3")(
        Graph.labelPropagation(rnd, "a", "b", 3).count())
      spark.stop(); return
    }

    // --- round-13: pathNgrams and markovRemovalEffects under the 8M/75%
    // firehose (`runMain … paths` runs only this section). Same event
    // shapes as the transition-matrix section below; measures whether the
    // single-user window task degenerates and what the bucketed split buys.
    if (args.contains("paths")) {
      def states(c: org.apache.spark.sql.Column) =
        pmod(hash(c), lit(6)).cast("string")
      val n2 = 8000000L
      val uniform = spark.range(n2).select(
          (col("id") % 10000L).as("user_id"), col("id").as("ts"),
          states(col("id")).as("state"))
        .repartition(64).localCheckpoint(true)
      val fire2 = spark.range(n2).select(
          when(col("id") % 4 =!= 3L, lit(0L))
            .otherwise(col("id") % 9999L + 1L).as("user_id"),
          col("id").as("ts"), states(col("id")).as("state"))
        .repartition(64).localCheckpoint(true)
      timed("pathNgrams(3) uniform8M 10k users")(
        Sessionize.pathNgrams(uniform, "user_id", "ts", "state", 3).count())
      timed("pathNgrams(3) firehose8M (1 user = 75%)")(
        Sessionize.pathNgrams(fire2, "user_id", "ts", "state", 3).count())
      timed("pathNgramsBucketed(3) firehose8M (1h)")(
        Sessionize.pathNgramsBucketed(fire2, "user_id", "ts", "state", 3,
          bucketHours = 1).count())
      // markov journey window: conv state "5" (~1/6 of events); the
      // data-scale step is one per-user lead+row_number window
      timed("markovRemovalEffects uniform8M")(
        Sessionize.markovRemovalEffects(uniform, "user_id", "ts", "state",
          convState = "5").count())
      timed("markovRemovalEffects firehose8M (1 user = 75%)")(
        Sessionize.markovRemovalEffects(fire2, "user_id", "ts", "state",
          convState = "5").count())
      // the converting firehose self-truncates (journeys stop at the
      // user's FIRST conv event); the adversarial shape is a firehose
      // that NEVER converts — its whole 6M-event stream survives the
      // journey filter and lands in one window task
      val fire3 = spark.range(n2).select(
          when(col("id") % 4 =!= 3L, lit(0L))
            .otherwise(col("id") % 9999L + 1L).as("user_id"),
          col("id").as("ts"),
          when(col("id") % 4 =!= 3L, pmod(hash(col("id")), lit(5)))
            .otherwise(pmod(hash(col("id")), lit(6)))
            .cast("string").as("state"))
        .repartition(64).localCheckpoint(true)
      timed("markovRemovalEffects neverConvFirehose8M")(
        Sessionize.markovRemovalEffects(fire3, "user_id", "ts", "state",
          convState = "5").count())
      timed("markovRemovalEffects neverConvFirehose8M bucketed(1h)")(
        Sessionize.markovRemovalEffects(fire3, "user_id", "ts", "state",
          convState = "5", journeyBucketHours = Some(1)).count())
      spark.stop(); return
    }

    for (level <- Seq("skew_mild", "skew_heavy")) {
      val recs = spark.read.parquet(s"testdata/$level/documents.parquet")
        .select(col("doc_id"),
          split(col("text"), " ").getItem(0).as("phone"),
          split(col("text"), " ").getItem(1).as("city"))
        .repartition(64).localCheckpoint(true)
      // analytic candidate mass per blocking field: sum over blocks of
      // d(d-1)/2, total vs cap-surviving — what the cap refuses to emit
      for (f <- Seq("phone", "city")) {
        val d = recs.groupBy(f).agg(count(lit(1)).as("d"))
        val row = d.agg(
          sum(col("d") * (col("d") - 1) / 2).as("uncapped"),
          sum(when(col("d").between(2, 256),
            col("d") * (col("d") - 1) / 2).otherwise(0)).as("capped256"),
          max(col("d")).as("maxDepth"),
          count(lit(1)).as("blocks")).collect().head
        println(s"[probe] $level $f: blocks=${row.get(3)} maxDepth=${row.get(2)} " +
          s"uncappedPairs=${row.get(0)} cap256Pairs=${row.get(1)}")
      }
      timed(s"$level blockedPairs(phone,city) cap=256")(
        Linkage.blockedPairs(recs, "doc_id", Seq("phone", "city"), maxBucket = 256).count())
      timed(s"$level blockedPairs(phone,city) cap=1024")(
        Linkage.blockedPairs(recs, "doc_id", Seq("phone", "city"), maxBucket = 1024).count())
    }

    // transition matrix: 2M events, 6 states; ts = id (strict total order)
    val n = 2000000L
    def states(c: org.apache.spark.sql.Column) =
      pmod(hash(c), lit(6)).cast("string")
    val uniform = spark.range(n).select(
        (col("id") % 10000L).as("user_id"), col("id").as("ts"),
        states(col("id")).as("state"))
      .repartition(64).localCheckpoint(true)
    val firehose = spark.range(n).select(
        when(col("id") % 2 === 0, lit(0L))
          .otherwise(col("id") % 9999L + 1L).as("user_id"),
        col("id").as("ts"), states(col("id")).as("state"))
      .repartition(64).localCheckpoint(true)
    timed("transitionMatrix uniform 10k users")(
      Sessionize.transitionMatrix(uniform, "user_id", "ts", "state").count())
    timed("transitionMatrix firehose (1 user = 50%)")(
      Sessionize.transitionMatrix(firehose, "user_id", "ts", "state").count())
    // bucketed variant: ts is a plain long tick, so bucketHours=1 buckets
    // on tick/3600 — the 1M-event firehose user spreads over ~556 buckets
    timed("transitionMatrixBucketed firehose (1h)")(
      Sessionize.transitionMatrixBucketed(firehose, "user_id", "ts", "state",
        bucketHours = 1).count())
    // a single-task-dominant shape: 8M events, ONE user is 75% of them
    val n2 = 8000000L
    val fire2 = spark.range(n2).select(
        when(col("id") % 4 =!= 3L, lit(0L))
          .otherwise(col("id") % 9999L + 1L).as("user_id"),
        col("id").as("ts"), states(col("id")).as("state"))
      .repartition(64).localCheckpoint(true)
    timed("transitionMatrix firehose8M (1 user = 75%)")(
      Sessionize.transitionMatrix(fire2, "user_id", "ts", "state").count())
    timed("transitionMatrixBucketed firehose8M (1h)")(
      Sessionize.transitionMatrixBucketed(fire2, "user_id", "ts", "state",
        bucketHours = 1).count())
    spark.stop()
  }
}
