package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for vector search (Jégou, Douze & Schmid,
  * "Product quantization for nearest neighbor search", TPAMI 2011): cut
  * each d-dim vector into `m` contiguous sub-vectors, k-means each
  * sub-space into `k` cells, and store per vector only the m cell codes
  * — d·4 bytes collapse to m·log₂k bits (64-dim float → 4 bytes at
  * m = 4, k = 16), the memory step between this repo's int8 index
  * ([[IvfIndex.topKQuantized]], 4×) and full precision. Queries score
  * by ASYMMETRIC distance (ADC): one m×k lookup table of exact
  * query-sub-vector→centroid distances per query, then a vector's
  * approximate distance is m table lookups summed — no corpus-side
  * float math at all. An exact re-rank over the ADC shortlist restores
  * true scores, so quantization can only affect WHICH candidates
  * surface, never their reported values ([[IvfIndex.topKQuantized]]'s
  * contract).
  *
  * Determinism: codebooks come from [[IvfIndex.centroids]]' determinist
  * k-means per block; code assignment argmins break ties on cell_id;
  * ADC sums fold per (query, vector) over BLOCK order. The final
  * ranking is the exact cosine with (score DESC, neighbor_id) ties —
  * identical to every other top-k operator here.
  *
  * Scale shape: training touches m × (corpus-width/m) sub-vectors with
  * the bounded Lloyd machinery; encoding is one broadcast join against
  * m·k centroids + a per-vector argmin aggregate; serving joins the
  * code table against a BROADCAST m·k-row LUT per query and sums —
  * map-side combinable — then re-ranks shortlistFactor·k rows exactly.
  */
object Pq {

  private def asD(c: Column): Column = transform(c, x => x.cast("double"))

  /** Squared L2 between two equal-length double arrays — the codegen'd
    * [[graft.functions.VecSqDist]] primitive loop (bit-identical IEEE
    * chain to the zip_with fold it replaced; that higher-order form ran
    * INTERPRETED n·m·k times on the encode path). */
  private def d2(a: Column, b: Column): Column =
    graft.functions.VecSqDist.sqDist(a, b)

  /** Per-block codebooks: `(block, cell_id, centroid)` — m·k rows,
    * broadcast-sized. `dim` must split evenly into `m` blocks. */
  def train(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int, k: Int = 16, iters: Int = 2): DataFrame = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must split into m ($m) equal blocks")
    val w = dim / m
    // the m sub-space k-means runs are INDEPENDENT, and each is a chain of
    // small jobs (Lloyd agg + checkpoint + collect per iteration) whose
    // cost is job-submission latency, not compute — run them from
    // concurrent driver threads so one block's jobs back-fill another's
    // scheduler gaps (optimization guide §2.6). Each block's arithmetic is
    // untouched, so per-block results are identical to the sequential run.
    val blocks = (0 until m).map { b =>
      scala.concurrent.Future {
        IvfIndex.centroids(
          corpus.select(col(idCol), slice(asD(col(vecCol)), b * w + 1, w)
            .as("_sub")),
          idCol, "_sub", nCells = k, iters = iters)
          .select(lit(b).as("block"), col("cell_id"), col("centroid"))
      }(scala.concurrent.ExecutionContext.global)
    }
    blocks.map(f => scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration.Inf))
      .reduce(_.unionByName(_))
  }

  /** Code table: `(idCol, block, code)` — each vector's nearest cell
    * per block (ties → smaller cell_id). m rows per vector; keep it
    * EXPLODED by block: that is exactly the shape the ADC join wants,
    * and a wide array column would just be re-exploded at serve time. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
             m: Int, codebooks: DataFrame): DataFrame = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must split into m ($m) equal blocks")
    val w = dim / m
    val subs = corpus.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        b => slice(asD(col(vecCol)), b * lit(w) + lit(1), lit(w)))))
      .select(col(idCol), col("pos").cast("int").as("block"),
        col("col").as("_sub"))
    subs.join(broadcast(codebooks), Seq("block"))
      .groupBy(col(idCol), col("block"))
      .agg(min(struct(d2(col("_sub"), col("centroid")).as("d"),
        col("cell_id").as("c"))).as("_m"))
      .select(col(idCol), col("block"), col("_m.c").as("code"))
  }

  /** ADC top-k with exact re-rank. Output schema, scores and tie-breaks
    * match [[IvfIndex.topK]]: `(query_id, rank, neighbor_id, score)`,
    * score the EXACT cosine. `shortlistFactor·k` bounds the re-rank
    * set; a factor covering the corpus makes the result exactly brute
    * force (the oracle regime — quantization then only reorders a
    * shortlist that contains everything). */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
           queries: DataFrame, k: Int, dim: Int, m: Int = 4,
           kCells: Int = 16, iters: Int = 2,
           shortlistFactor: Int = 4): DataFrame = {
    require(k >= 1 && shortlistFactor >= 1, "k and shortlistFactor >= 1")
    val books = train(corpus, idCol, vecCol, dim, m, kCells, iters)
      .localCheckpoint(true) // encode + LUT both read it
    val codes = encode(corpus, idCol, vecCol, dim, m, books)
    val w = dim / m
    // per-query LUT: exact distance from each query sub-vector to each
    // centroid — m·kCells rows per query, broadcast
    val lut = queries.select(col("query_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          b => slice(asD(col("query_vec")), b * lit(w) + lit(1), lit(w)))))
      .select(col("query_id"), col("pos").cast("int").as("block"),
        col("col").as("_qsub"))
      .join(broadcast(books), Seq("block"))
      .select(col("query_id"), col("block"), col("cell_id").as("code"),
        d2(col("_qsub"), col("centroid")).as("_d"))
    val approx = codes.join(broadcast(lut), Seq("block", "code"))
      .groupBy(col("query_id"), col(idCol))
      // block-count-bounded sum of exact doubles; fold order irrelevant
      // to the SHORTLIST contract (ties below break on id), and the
      // reported score is the exact re-rank anyway
      .agg(sum(col("_d")).as("_approx"))
    exactRerank(corpus, idCol, vecCol, queries, k,
      adcShortlist(approx, idCol, k * shortlistFactor))
  }

  /** IVFADC (Jégou et al. 2011 §IV) — the composition of this repo's two
    * ANN halves into the deployment shape for 10⁹-vector serving: an IVF
    * coarse quantizer picks each query's `nProbe` cells, PQ codes built
    * on the RESIDUALS r = v − centroid(cell(v)) (the paper's key move —
    * codes only have to span the within-cell spread, not the whole
    * space) are ADC-scored for the probed cells' postings ONLY, and the
    * shortlist is exact-re-ranked. Output schema, scores, tie-breaks
    * match [[topK]]/[[IvfIndex.topK]]: `(query_id, rank, neighbor_id,
    * score)`, score the EXACT cosine.
    *
    * With `nProbe = nCells` and a corpus-covering `shortlistFactor` the
    * result is exactly brute force (the oracle regime — every posting
    * reaches the shortlist, so quantization cannot drop a true
    * neighbor); at `nProbe < nCells` the recall trade is the IVF one
    * (a true neighbor in an unprobed cell is unreachable) ON TOP of the
    * PQ shortlist trade — PqSpec measures recall@10 in that regime.
    *
    * Scale shape: build is [[IvfIndex.buildIndex]] (broadcast-argmin
    * assignment) + one broadcast centroid join for residuals + PQ
    * train/encode over m sub-spaces; serving joins the code table
    * against a BROADCAST per-(query, probed-cell) LUT — queries ×
    * nProbe × m × kCells rows, the LUT keys carry `cell_id` so unprobed
    * cells never match — then one map-side-combinable sum, an O(k)
    * heap-aggregate shortlist, and a shortlist-sized exact re-rank.
    * Nothing anywhere touches unprobed postings. */
  def topKFromIvf(corpus: DataFrame, idCol: String, vecCol: String,
                  queries: DataFrame, k: Int, dim: Int, m: Int = 4,
                  kCells: Int = 16, nCells: Int = 16, nProbe: Int = 4,
                  iters: Int = 2, shortlistFactor: Int = 4): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells,
      s"nProbe ($nProbe) must be in [1, nCells ($nCells)]")
    val (cents, books, codes) = buildIvfPq(corpus, idCol, vecCol, dim, m,
      kCells, nCells, iters)
    serveResidualAdc(cents, books, codes, corpus, idCol, vecCol, queries,
      k, dim, m, nProbe, shortlistFactor)
  }

  /** The IVFADC index triple `(centroids, books, codes)`:
    * `centroids(cell_id, centroid)` — the IVF coarse quantizer;
    * `books(block, cell_id, centroid)` — residual PQ codebooks;
    * `codes(neighbor_id, block, code, cell_id)` — each posting's m
    * residual codes plus its IVF cell. */
  private def buildIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, m: Int, kCells: Int, nCells: Int,
                         iters: Int): (DataFrame, DataFrame, DataFrame) = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must split into m ($m) equal blocks")
    val (cents0, indexed) = IvfIndex.buildIndex(corpus, idCol, vecCol,
      nCells, iters)
    val cents = cents0.localCheckpoint(true) // residuals + probes read it
    // residual per posting: r = v − centroid(cell(v)) — one broadcast join
    val resid = indexed.join(broadcast(cents), Seq("cell_id"))
      .select(col("neighbor_id"), col("cell_id"),
        zip_with(asD(col("c_vec")), col("centroid"), (x, y) => x - y)
          .as("_res"))
      .localCheckpoint(true) // feeds train + encode + the cell map
    val books = train(resid, "neighbor_id", "_res", dim, m, kCells, iters)
      .localCheckpoint(true)
    val codes = encode(resid, "neighbor_id", "_res", dim, m, books)
      .join(resid.select("neighbor_id", "cell_id"), Seq("neighbor_id"))
    (cents, books, codes)
  }

  /** Persist an IVFADC index: `<path>/centroids`, `<path>/books`,
    * `<path>/codes` partitioned BY CELL — a query's probed cells then
    * prune to nProbe directories at read time, the PQ analogue of
    * [[IvfIndex.saveIndex]]'s inverted-file seek, at m·log₂k bits per
    * vector instead of the full floats. `<path>/meta` records (dim, m)
    * so serving cannot silently mis-slice. The exact re-rank reads
    * full vectors from the CALLER's corpus table (an id-keyed store at
    * deployment scale), so the index itself never stores them. */
  def saveIvfPqIndex(path: String, corpus: DataFrame, idCol: String,
                     vecCol: String, dim: Int, m: Int = 4,
                     kCells: Int = 16, nCells: Int = 16,
                     iters: Int = 2): Unit = {
    val (cents, books, codes) = buildIvfPq(corpus, idCol, vecCol, dim, m,
      kCells, nCells, iters)
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    books.write.mode("overwrite").parquet(s"$path/books")
    codes.write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$path/codes")
    Seq((dim, m)).toDF("dim", "m").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Serve from a [[saveIvfPqIndex]] index. Doubles round-trip parquet
    * bit-exactly, so the persisted serve returns IDENTICAL results to
    * the fused [[topKFromIvf]] at the same parameters (PqSpec pins it).
    * The probed cells are collected (≤ nCells ids, driver-bounded) and
    * pushed as a STATIC partition filter on the code table — the scan
    * opens only the probed cells' directories. */
  def topKFromIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, corpus: DataFrame, idCol: String,
                         vecCol: String, queries: DataFrame, k: Int,
                         nProbe: Int = 4,
                         shortlistFactor: Int = 4): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val dim = meta.getInt(0); val m = meta.getInt(1)
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cell_id").cast("int").as("cell_id"), col("centroid"))
    val books = spark.read.parquet(s"$path/books")
    val codes = spark.read.parquet(s"$path/codes")
      .withColumn("cell_id", col("cell_id").cast("int"))
    serveResidualAdc(cents, books, codes, corpus, idCol, vecCol, queries,
      k, dim, m, nProbe, shortlistFactor, pruneCodeScan = true)
  }

  /** The shared IVFADC serve: per-(query, probed-cell) residual LUT →
    * ADC over the probed cells' codes → O(k) shortlist → exact re-rank.
    * With `pruneCodeScan` the probed cell ids (≤ nCells after distinct)
    * are collected and applied as a static partition filter before the
    * LUT join — on a cell-partitioned on-disk code table the scan then
    * opens only the probed directories. */
  private def serveResidualAdc(cents: DataFrame, books: DataFrame,
                               codes: DataFrame, corpus: DataFrame,
                               idCol: String, vecCol: String,
                               queries: DataFrame, k: Int, dim: Int, m: Int,
                               nProbe: Int, shortlistFactor: Int,
                               pruneCodeScan: Boolean = false): DataFrame = {
    require(k >= 1 && shortlistFactor >= 1, "k and shortlistFactor >= 1")
    require(nProbe >= 1, s"nProbe ($nProbe) must be >= 1")
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must split into m ($m) equal blocks")
    val w = dim / m
    val probes = IvfIndex.probeCells(queries, cents, nProbe)
      .localCheckpoint(false) // LUT + the pruning id set both read it
    // per-(query, probed cell) LUT: the query's OWN residual against that
    // cell (q − centroid), exact sub-vector distances to the codebook
    val qres = probes
      .join(broadcast(cents), Seq("cell_id"))
      .select(col("query_id"), col("cell_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          b => slice(zip_with(asD(col("query_vec")), col("centroid"),
            (x, y) => x - y), b * lit(w) + lit(1), lit(w)))))
      .select(col("query_id"), col("cell_id"),
        col("pos").cast("int").as("block"), col("col").as("_qres"))
    val lut = qres
      .join(broadcast(books.select(col("block"), col("cell_id").as("code"),
        col("centroid").as("_bc"))), Seq("block"))
      .select(col("query_id"), col("cell_id"), col("block"), col("code"),
        d2(col("_qres"), col("_bc")).as("_d"))
    val scanned =
      if (!pruneCodeScan) codes
      else {
        val probed = probes.select("cell_id").distinct()
          .collect().map(_.getInt(0)).sorted
        codes.filter(col("cell_id")
          .isin(probed.map(Integer.valueOf).toSeq: _*))
      }
    // ADC over probed cells only: the join keys carry the IVF cell_id
    val approx = scanned.join(broadcast(lut), Seq("cell_id", "block", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("_d")).as("_approx"))
    exactRerank(corpus, idCol, vecCol, queries, k,
      adcShortlist(approx, "neighbor_id", k * shortlistFactor))
  }

  /** The `n` smallest-`_approx` ids per query as `(query_id,
    * neighbor_id)` — an O(n)-state heap aggregate ([[TopK]] with ord =
    * −approx), NOT a `row_number` window: the window's per-partition
    * full sort over (queries × candidates) is avoidable work at
    * 10⁴ queries × 10⁹ vectors, and a hot query's whole candidate set
    * would land in one sort task. Tie semantics are the window's
    * exactly: (approx ASC, id ASC) — negation is IEEE-exact and the
    * heap breaks ord ties on the id. `idCol` must be integral (the
    * heap's tie seam — every vector id in this repo is). */
  private def adcShortlist(approx: DataFrame, idCol: String,
                           n: Int): DataFrame =
    approx.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(n, -col("_approx"), col(idCol),
        col(idCol)).as("_top"))
      .select(col("query_id"), explode(col("_top")).as("_e"))
      .select(col("query_id"), col("_e.payload").as("neighbor_id"))

  /** Exact-cosine re-rank of a `(query_id, neighbor_id)` shortlist —
    * the shared tail of every PQ server: scores are computed from the
    * FULL-precision corpus vectors, so quantization only ever affects
    * which candidates surface, never their reported values. The final
    * window runs over shortlist-sized partitions (≤ k·shortlistFactor
    * rows per query), not the corpus. */
  private def exactRerank(corpus: DataFrame, idCol: String, vecCol: String,
                          queries: DataFrame, k: Int,
                          shortlist: DataFrame): DataFrame = {
    val exact = shortlist
      .join(corpus.select(col(idCol).as("neighbor_id"),
        asD(col(vecCol)).as("_cv")), Seq("neighbor_id"))
      .join(queries.select(col("query_id"), asD(col("query_vec")).as("_qv")),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.VecDot.dot(col("_cv"), col("_qv")) /
          (sqrt(graft.functions.VecDot.dot(col("_cv"), col("_cv"))) *
            sqrt(graft.functions.VecDot.dot(col("_qv"), col("_qv")))))
          .as("score"))
    val rw = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }
}
