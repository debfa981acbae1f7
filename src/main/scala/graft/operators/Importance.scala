package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Data Selection via Importance Resampling — DSIR (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023): given a small TARGET corpus (the distribution you want more of)
  * and a large RAW corpus, weight every raw document by the likelihood
  * ratio of two hashed-n-gram bag-of-features models and resample the raw
  * corpus in proportion — the principled version of "pick web pages that
  * look like Wikipedia".
  *
  * Features are word BIGRAMS hashed into `buckets` counters (the paper's
  * hashed n-gram parameterization — collisions are part of the model, not
  * an error); both feature distributions are add-one-smoothed
  * multinomials over those buckets, so a document's log importance weight
  * is a fixed-order sum of per-occurrence bucket log-ratios
  * `ln((ct+1)/(Nt+B)) - ln((cr+1)/(Nr+B))`. Selection is the paper's
  * Gumbel top-k trick: `argtop-k(logw_i + g_i)` with i.i.d. Gumbel noise
  * draws exactly `k` documents WITHOUT replacement in proportion to
  * `exp(logw)` — one bounded-heap pass, no sequential sampling loop. The
  * noise here is DETERMINISTIC: `u` comes from the exact-integer
  * polynomial hash of the document id (same base-257/mod-1e9+7 recipe as
  * [[TextAnalysis.winnowingFingerprints]]), so reruns, retries and the
  * cross-engine oracle reproduce the identical sample.
  *
  * Scale shape (the raw corpus is the 100 TB side):
  *  - Each feature-count model is ONE map-side-combinable aggregation
  *    whose output is at most `buckets` rows — broadcast unconditionally
  *    (a few KB), never a vocabulary-sized exchange.
  *  - Raw documents are touched twice — the irreducible two-pass shape
  *    (the raw model must exist before any document can be scored against
  *    it): one counting pass, one scoring pass where bigram hashing and
  *    both model lookups are per-row map work against broadcast tables.
  *    The only corpus-sized exchange is the per-document regroup for the
  *    ordered log-ratio fold (partials complete map-side — a document's
  *    features never leave their task); the final weight join re-reads
  *    only the column-pruned id list. Per-document aggregation state is
  *    O(doc tokens) — the same order as the document row itself, so no
  *    new skew hazard beyond the scan's; cap pathological documents
  *    upstream (the `LanguageModel.perplexityScore` guidance).
  *  - Gumbel top-k is the O(k)-state [[TopK]] aggregate: map-side partial
  *    heaps, one k-row final merge — never a global sort.
  *
  * Documents with fewer than 2 tokens have no bigram features: their
  * feature sum is empty, so `logw = 0` (likelihood ratio 1, the paper's
  * implicit convention for feature-less inputs) and they still enter the
  * resampling pool.
  */
object Importance {

  private val HashMod = 1000000007L

  private def polyHash(s: Column): Column = TextAnalysis.polyHash(s)

  /** `(id, pos, bucket)` hashed-bigram feature stream. One occurrence per
    * adjacent token pair — DSIR weights use occurrence COUNTS, so no
    * distinct. The token array is let-bound to an attribute before any
    * lambda references it. */
  private def features(df: DataFrame, idCol: String, textCol: String,
                       buckets: Int): DataFrame =
    df.select(col(idCol),
        filter(split(TextAnalysis.normalized(col(textCol)), " "), c => c =!= "")
          .as("_tk"))
      .filter(size(col("_tk")) >= 2)
      .select(col(idCol), explode(transform(sequence(lit(1), size(col("_tk")) - 1),
        i => struct(i.cast("int").as("pos"),
          concat(element_at(col("_tk"), i), lit(" "),
            element_at(col("_tk"), i + 1)).as("g")))).as("_f"))
      .select(col(idCol), col("_f.pos").as("pos"),
        pmod(polyHash(col("_f.g")), lit(buckets.toLong)).as("bucket"))

  /** Per-bucket occurrence counts of one corpus slice: `(bucket, n)`,
    * at most `buckets` rows. */
  private def bucketCounts(df: DataFrame, idCol: String, textCol: String,
                           buckets: Int): DataFrame =
    features(df, idCol, textCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** Log importance weight `(idCol, n_feats, logw)` for every `raw`
    * document — `logw` UNROUNDED (callers rank on it; round for
    * display), higher = more target-like. `n_feats = 0` rows carry
    * `logw = 0`. `idCol` is expected to be a non-null key: a NULL id
    * cannot match the weight re-add join, so such a row is reported as
    * feature-less (`logw = 0`). */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, buckets: Int = 1024): DataFrame =
    dsirLogWeightsAmong(raw, target, lit(true), idCol, textCol, buckets)

  /** [[dsirLogWeights]] restricted to a candidate pool: the importance
    * MODELS (target and proposal bucket counts) are built over the FULL
    * `raw` corpus, but only rows satisfying `candidate` are scored — the
    * "score one slice against corpus-level statistics" shape (and the
    * deterministic-subset oracle harness at scale). `candidate` must be
    * a deterministic predicate over `idCol` alone (it is applied to the
    * internal feature stream, which carries only the id). */
  def dsirLogWeightsAmong(raw: DataFrame, target: DataFrame,
                          candidate: Column, idCol: String, textCol: String,
                          buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets ($buckets) must be >= 2")
    // A feature-less target would null the nt total, null every lam, and
    // the final coalesce would rewrite ALL weights to 0 — a full-looking
    // "importance sample" that is actually uniform noise. Fail loudly.
    val ctGate = Gates.countedBroadcast(
      bucketCounts(target, idCol, textCol, buckets)
        .withColumnRenamed("n", "ct"), maxRows = buckets.toLong)
    require(ctGate.rows > 0,
      "dsirLogWeights: the target corpus has no bigram features (empty, " +
        "or no document with >= 2 tokens) — weights would be noise")
    val ct = ctGate.pinned
    // Pin the raw feature stream: it feeds BOTH the raw bucket counts and
    // the scoring stream below, and without a barrier the tokenize +
    // per-char hash fold (the expensive part) runs twice over the corpus.
    // One compact (id, pos, bucket) row per bigram occurrence in executor
    // storage, spillable — measured 4.28 -> ~2.9 s at sf0.1.
    val fr = features(raw, idCol, textCol, buckets).localCheckpoint(false)
    val cr = fr.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val totals = ct.agg(sum("ct").as("nt"))
      .crossJoin(cr.agg(sum("cr").as("nr")))
    // Per-occurrence log-ratio, folded in position order: ln args are
    // exact integer-ratio doubles, so the fold is bit-reproducible.
    // Scoring runs only over the candidate pool; the bucket counts above
    // deliberately came from the FULL stream.
    val lam = fr.filter(candidate)
      .join(broadcast(ct), Seq("bucket"), "left")
      .join(broadcast(cr), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("pos"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
           (col("nt") + lit(buckets.toLong)).cast("double")) -
         log((coalesce(col("cr"), lit(0L)) + lit(1L)).cast("double") /
           (col("nr") + lit(buckets.toLong)).cast("double"))).as("lam"))
    val summed = lam.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        collect_list(struct(col("pos"), col("lam"))).as("cl"))
      .select(col(idCol), col("n_feats"),
        aggregate(sort_array(col("cl")), lit(0.0),
          (a, s) => a + s.getField("lam")).as("logw"))
    raw.select(col(idCol)).filter(candidate).join(summed, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logw"), lit(0.0)).as("logw"))
  }

  /** Gumbel top-`k` selection over [[dsirLogWeights]]: returns the
    * resampled documents as `(rank, idCol, n_feats, logw)` with `logw`
    * rounded to 6 decimals (ranking uses the unrounded key). `domain`
    * salts the noise hash so independent draws don't correlate. */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Int, buckets: Int = 1024,
                   domain: String = "dsir"): DataFrame =
    dsirResampleAmong(raw, target, lit(true), idCol, textCol, k, buckets, domain)

  /** [[dsirResample]] over a candidate pool (see
    * [[dsirLogWeightsAmong]]): models from the full corpus, Gumbel
    * top-`k` drawn only among rows satisfying `candidate`. */
  def dsirResampleAmong(raw: DataFrame, target: DataFrame, candidate: Column,
                        idCol: String, textCol: String, k: Int,
                        buckets: Int = 1024,
                        domain: String = "dsir"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = dsirLogWeightsAmong(raw, target, candidate, idCol, textCol, buckets)
    // u in (0, 1) from the exact id hash; g = -ln(-ln(u)) is standard
    // Gumbel. u is never 0 or 1 (the +0.5 offset), so g is finite.
    val u = (polyHash(concat(col(idCol).cast("string"), lit(":" + domain)))
      .cast("double") + lit(0.5)) / lit(HashMod.toDouble)
    val key = w.select(col(idCol), col("n_feats"), col("logw"),
      (col("logw") - log(-log(u))).as("gk"))
    key.agg(TopK.topK(k, col("gk"), col(idCol),
        struct(col(idCol).as("id"), col("n_feats").as("nf"),
          col("logw").as("lw"))).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("col.payload.id").as(idCol),
        col("col.payload.nf").as("n_feats"),
        round(col("col.payload.lw"), 6).as("logw"))
  }
}
