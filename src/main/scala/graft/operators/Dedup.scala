package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines.
  *
  * Four families, in increasing fuzziness:
  *  - exact: hash-groupBy on the raw text (one shuffle on the hash — the
  *    only scalable exact-dedup shape; dropDuplicates does the same under
  *    the hood but keeps a nondeterministic row, so we keep min-id);
  *  - canonical: same, on the normalized word-set fingerprint;
  *  - MinHash + LSH: shingle → k-minhash signature → band → bucket-join;
  *    candidate pairs only ever meet inside a band bucket, so the shuffle
  *    volume is O(docs × bands), never O(docs²);
  *  - SimHash: 64-bit per-doc signature, computed entirely per-row (zero
  *    shuffle) — near-dups share a signature or differ in few bits;
  *  - char-set Jaccard: blocked pairwise similarity with an exact DuckDB
  *    oracle (`jaccard()`), the differential anchor for the fuzzy family.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups: one row per distinct text hash with group size
    * and the kept (minimum) id — deterministic, unlike dropDuplicates. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("keep_id"))

  /** Canonical-form duplicate groups via the fingerprint key (case/order/
    * punctuation-insensitive). */
  def fingerprintGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("keep_id"))

  // -------------------------------------------------------------- minhash

  /** Word n-gram shingles of `text` as an array column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(trim(text), "\\s+")
    when(size(words) < n, array(array_join(words, " ")))
      .otherwise(transform(
        sequence(lit(1), size(words) - lit(n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
  }

  // MinHash family h_j(x) = (a_j * x32 + b_j) mod p over 32-bit base hashes;
  // p is the smallest prime > 2^32 so a_j * x32 stays inside a signed Long.
  private val MinhashPrime = 4294967311L
  private def hashParams(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((rnd.nextInt(Int.MaxValue).toLong + 1L, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** k-wide MinHash signatures as an (id, sig: array<bigint>) DataFrame.
    *
    * Shape: per-row word-hash array (each word hashed ONCE) → shingle
    * hashes by combining `shingleN` consecutive word hashes arithmetically
    * (no per-shingle string building — measured 2-3× cheaper than
    * array_join+xxhash per shingle) → explode → groupBy(id) with k `min`
    * partial aggregates. The aggregation is a materialization barrier, so
    * nothing upstream is duplicated by projection collapse (a naive
    * per-row nested-`transform` formulation gets copied k×bands times —
    * measured 25× slower). Map-side partial mins mean the shuffle carries
    * one k-wide row per doc. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 32, shingleN: Int = 3): DataFrame = {
    require(shingleN >= 1 && shingleN <= PolyCoef.length,
      s"shingleN ($shingleN) must be in [1, ${PolyCoef.length}]: larger values " +
        "overrun the positional-coefficient table and void the documented " +
        "ANSI no-overflow bound (< 2^62)")
    // one projection materializing the 32-bit word-hash array (each word
    // hashed once); Spark 4 runs ANSI mode, so the combine must provably
    // not overflow: h32 < 2^32 times coef < 2^27, n ≤ 6 terms → < 2^62
    val withHashes = df.select(col(idCol).as("id"),
      transform(split(trim(col(textCol)), "\\s+"),
        w => pmod(xxhash64(w), lit(4294967296L))).as("wh"))
    // shingle hash = positional linear combine of n consecutive word hashes;
    // `wh` is a bound attribute (the Generate below blocks projection
    // collapse), so get() lookups are O(1) array reads, not recomputations
    val shingleHashes = withHashes.select(col("id"),
      explode(
        when(size(col("wh")) < shingleN,
          array(aggregate(col("wh"), lit(0L),
            (acc, h) => pmod(acc * lit(31L) + h, lit(4294967296L)))))
          .otherwise(transform(
            sequence(lit(0), size(col("wh")) - lit(shingleN)),
            i => (0 until shingleN).map(j =>
              get(col("wh"), i + lit(j)) * lit(PolyCoef(j))).reduce(_ + _))))
        .as("sh64"))
    val hashed = shingleHashes.select(col("id"), pmod(col("sh64"), lit(4294967296L)).as("h32"))
    hashed.groupBy("id").agg(
      array(hashParams(k).map { case (a, b) =>
        min(pmod(lit(a) * col("h32") + lit(b), lit(MinhashPrime)))
      }: _*).as("sig"))
  }

  // small odd primes (< 2^27) for the positional combine — order-sensitive,
  // and ANSI-overflow-safe against 32-bit word hashes
  private val PolyCoef = Array(1299709L, 15485863L, 32452843L, 49979687L, 67867967L, 86028121L)

  /** LSH candidate pairs: signatures split into `bands` bands; docs sharing
    * any full band land in the same bucket; pairs are emitted per bucket
    * with their estimated (signature-agreement) similarity.
    *
    * Pairs are generated inside a per-bucket `collect_list` rather than a
    * self-join: a self-join would evaluate the whole signature pipeline
    * twice (no exchange reuse across a BroadcastExchange — measured 2×),
    * while this shape computes signatures once and shuffles them once.
    *
    * Bucket-skew guard: a degenerate bucket (thousands of mutual near-dups
    * — boilerplate-heavy corpora produce them) would otherwise concentrate
    * O(m²) pairs AND an O(m)-element array in ONE task. Members are
    * therefore ranked inside their bucket (a window on the same
    * (band, bucket) partitioning — no extra exchange, the sort is
    * streaming+spillable): the `maxBucket` lowest-id members form the full
    * pairwise clique (bounding per-task work at maxBucket² pair emissions
    * and per-row state at maxBucket structs), and every beyond-cap member
    * emits exactly ONE linking pair to the bucket's minimum-id member — so
    * no member is ever silently orphaned (a dropped member would surface
    * as a false unique downstream), total pairs stay O(maxBucket² + m).
    * What IS dropped: pairwise candidates AMONG beyond-cap members (their
    * connectivity rides through the minimum).
    *
    * Connectivity guarantee, stated precisely: cluster connectivity is
    * preserved for connected components over the UNFILTERED pair set. A
    * downstream `est_jaccard >= t` filter keeps a beyond-cap member
    * connected only if its single linking pair to the bucket minimum
    * itself scores >= t — true in the degenerate case the cap exists for
    * (boilerplate buckets of mutual near-dups, where every member is
    * near-identical to the minimum), but a beyond-cap member whose only
    * above-threshold neighbor is some OTHER capped-clique member can be
    * severed. If you filter candidates before clustering, either keep the
    * cap comfortably above your expected true-duplicate group size, or
    * audit oversized buckets with [[minhashBucketProfile]] first. */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                            maxBucket: Int = 256): DataFrame = {
    require(k % bands == 0,
      s"k ($k) must divide evenly into bands ($bands) — trailing hashes would be silently unused")
    require(maxBucket >= 2, s"maxBucket ($maxBucket) must be >= 2 to emit any pair")
    val banded = bandedSignatures(df, idCol, textCol, k, bands, shingleN)
    val wb = Window.partitionBy("band", "bucket").orderBy("id")
    // running first_value = the rank-1 (minimum-id) member's id/sig — same
    // partitioning+ordering as the rank window, so all three share one Sort
    val wbRun = Window.partitionBy("band", "bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val estJac = (a: Column, b: Column) =>
      size(filter(zip_with(a, b, (x, y) => x === y), v => v))
        .cast("double") / lit(k.toDouble)
    val ranked = banded
      .withColumn("_r", row_number().over(wb))
      .withColumn("_min_id", first("id").over(wbRun))
      .withColumn("_min_sig", first("sig").over(wbRun))
    val buckets = ranked
      .filter(col("_r") <= maxBucket)
      .groupBy("band", "bucket")
      .agg(collect_list(struct(col("id"), col("sig"))).as("ms"))
      .filter(size(col("ms")) > 1)
    val cliquePairs = buckets
      .select(explode(flatten(transform(col("ms"), a =>
        filter(
          transform(col("ms"), b => struct(
            a.getField("id").as("id_a"),
            b.getField("id").as("id_b"),
            estJac(a.getField("sig"), b.getField("sig")).as("est_jaccard"))),
          s => s.getField("id_a") < s.getField("id_b"))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.est_jaccard").as("est_jaccard"))
    // beyond-cap members: one linking pair each to the bucket minimum
    // (_min_id < id always holds at _r > maxBucket >= 2)
    val overflowPairs = ranked
      .filter(col("_r") > maxBucket)
      .select(col("_min_id").as("id_a"), col("id").as("id_b"),
        estJac(col("_min_sig"), col("sig")).as("est_jaccard"))
    cliquePairs.unionByName(overflowPairs).distinct()
  }

  /** (id, sig, band, bucket) — one row per document per band. */
  private def bandedSignatures(df: DataFrame, idCol: String, textCol: String,
                               k: Int, bands: Int, shingleN: Int): DataFrame = {
    val rows = k / bands
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleN)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(array_join(transform(
        slice(col("sig"), b * rows + 1, rows), x => x.cast("string")), ",")).as("bucket"))
    }
    sigs.select(col("id"), col("sig"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Skew audit for [[minhashCandidatePairs]]: the (band, bucket) groups
    * whose member count exceeds `minSize`, largest first. Run it when a
    * corpus may be boilerplate-heavy to see what a given `maxBucket` cap
    * will truncate (each listed bucket drops its pairs beyond the cap's
    * lowest-id clique). */
  def minhashBucketProfile(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                           minSize: Int = 2): DataFrame =
    bandedSignatures(df, idCol, textCol, k, bands, shingleN)
      .groupBy("band", "bucket").agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") >= minSize)
      .orderBy(col("n_members").desc, col("band"), col("bucket"))

  // -------------------------------------------------------------- simhash

  /** Bulk 64-bit SimHash: one `simhash` per input row, computed through the
    * explode → groupBy shape — each word is hashed ONCE, the 64 bit-vote
    * sums are partial aggregates (map-side combined; the shuffle carries 64
    * longs per key), and the sign/packing step is a tiny post-agg
    * projection. This is the 100 TB path: the scalar [[simhash64]] Column
    * re-evaluates its word-hash array inside each of the 64 per-bit
    * aggregate lambdas (projection collapse duplicates it 64×, measured
    * ~60× slower at corpus scale) and exists for small-data composition
    * only. Semantics are identical: same tokens, same votes, same packing.
    * Null text included: `explode_outer` keeps the row with a null word
    * hash whose universally-null votes sum to a non-positive bit vote on
    * every bit — signature 0, exactly what the scalar form produces for a
    * null token array (a plain `explode` would silently drop the row,
    * shrinking the corpus on the scale path only).
    *
    * `keys` must uniquely identify rows (extra columns ride along). */
  def simhashBulk(df: DataFrame, keys: Seq[String], textCol: String): DataFrame = {
    require(keys.nonEmpty, "simhashBulk needs at least one key column")
    // xxhash64(null) would return the seed (a REAL hash vote); keep the
    // null-text marker null so its votes stay null -> -1 per bit
    val words = df.select(keys.map(col) :+
      explode_outer(split(trim(col(textCol)), "\\s+")).as("_w"): _*)
      .select(keys.map(col) :+
        when(col("_w").isNotNull, xxhash64(col("_w"))).as("_h"): _*)
    val sums = (0 until 64).map { i =>
      sum(when(shiftright(col("_h"), i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"_b$i")
    }
    words.groupBy(keys.map(col): _*)
      .agg(sums.head, sums.tail: _*)
      .select(keys.map(col) :+
        (0 until 64).map(i => when(col(s"_b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"): _*)
  }

  /** 64-bit SimHash over word hashes, computed per-row with higher-order
    * functions: each word votes ±1 on each bit of its xxhash64; the sign of
    * the per-bit sum becomes the signature bit. The 64 bit positions are
    * unrolled at plan-build time so every shift amount is a literal
    * (codegen-friendly; no variable-shift expression exists in the API).
    * For corpus-scale signatures use [[simhashBulk]] — this Column form
    * re-evaluates the word-hash array per bit. */
  def simhash64(text: Column): Column = {
    val hashes = transform(split(trim(text), "\\s+"), w => xxhash64(w))
    val bits = (0 until 64).map { i =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------- blocked char jaccard

  /** Character-set Jaccard similarity (DuckDB `jaccard()` semantics: the
    * operands are compared as sets of characters). */
  def charJaccard(a: Column, b: Column): Column = {
    // split on "" leaves a trailing "" element — drop it or set sizes skew
    val sa = array_distinct(filter(split(a, ""), c => c =!= ""))
    val sb = array_distinct(filter(split(b, ""), c => c =!= ""))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** Blocked pairwise near-dup scan: pairs are only formed inside a
    * (lang, length-bucket) block, keeping the candidate count ~linear in
    * practice instead of O(n²). The blocking keys do NOT scale with the
    * corpus, so the within-block pair space is still quadratic in block
    * occupancy (measured: 10× docs ≈ 37× wall-clock on the fixture —
    * PLANS.md round-7 sweep); when blocks outgrow ~10³ documents, switch
    * to [[minhashCandidatePairs]], whose buckets scale with the corpus
    * (2.7× for the same 10×).
    *
    * The distinct-character set is computed ONCE per document, below the
    * join exchange — never per pair. (The naive per-pair `charJaccard`
    * re-splits both full texts for every candidate pair: measured 45×
    * slower at 270k pairs.) Per pair only the ~30-element set intersection/
    * union runs. */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          langCol: String, lenCol: String,
                          bucketWidth: Int = 64, threshold: Double = 0.8): DataFrame =
    charMasks(df, idCol, textCol, langCol, lenCol, bucketWidth, "a")
      .join(charMasks(df, idCol, textCol, langCol, lenCol, bucketWidth, "b"),
        Seq("blk_lang", "blk_len"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), maskJaccard.as("jac"))
      .filter(col("jac") >= threshold)

  /** Exact word-n-gram Jaccard near-dup pairs — MinHash's exact
    * counterpart: the same (lang, length-bucket) blocking as
    * [[blockedJaccardPairs]], but per-pair similarity is the TRUE Jaccard
    * of the distinct word-n-gram sets (strings, not sketches — zero
    * estimation error). Candidates come from a frequency-ordered
    * prefix-filter index (AllPairs), then only survivors pay the
    * O(grams) exact intersect — near-linear candidates on an
    * open-vocabulary corpus, where rare grams exist to anchor prefixes.
    * Use when false positives/negatives from sketching are unacceptable.
    * Documents with fewer than `n` tokens (empty gram set — Jaccard
    * undefined) never pair.
    *
    * SCALING LIMIT (measured, PLANS.md round-7 sweep): the blocking keys
    * do not grow with the corpus, so on a corpus where every gram is
    * common — a small closed vocabulary, heavy boilerplate — the prefix
    * filter loses its anchor and the verified set approaches the
    * block-quadratic bound (10× docs ≈ 99× within-block pairs on the
    * 31-token fixture; wall-clock grew 55×, the filter still halving the
    * quadratic term). Exact threshold enumeration cannot beat its own
    * output size; when blocks outgrow ~10³ documents, the scale path is
    * [[minhashCandidatePairs]] (buckets scale WITH the corpus) or
    * [[graft.operators.IvfIndex.semanticDedup]] (√n-sized cells).
    *
    * `maxBroadcastGrams` caps the document-frequency table (df > 1 grams
    * only) that may be broadcast to the gram stream: at or below the cap
    * (counted, not guessed) it ships as a broadcast join; above it the
    * plan falls back to a shuffle join rather than risk driver memory or
    * Spark's 8 GB broadcast limit on an open-vocabulary corpus. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        langCol: String, lenCol: String, n: Int = 2,
                        bucketWidth: Int = 64, threshold: Double = 0.8,
                        maxBroadcastGrams: Long = 50000000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold ($threshold) must be in (0, 1] — prefix filtering is " +
        "vacuous at 0 and the block-quadratic pair space comes back")
    // Per-doc distinct gram set. Docs with an empty gram set (< n tokens,
    // or null text) can never reach a positive threshold — Jaccard is 0
    // against non-empty sets, undefined against empty ones — so they are
    // dropped here, which also keeps the final division's denominator
    // strictly positive under ANSI mode. The lazy localCheckpoint is
    // load-bearing: this subtree feeds FOUR consumers (the gram stream for
    // document frequency, the prefix ranking, and both verification join
    // sides), two of them across a self-join that Catalyst evaluates as
    // independent subplans — without a materialization barrier the n-gram
    // projection (the expensive part) re-runs once per consumer. One
    // compact (block keys, id, gram array) row per doc in executor
    // storage, spillable, reclaimed by the ContextCleaner on dereference.
    val docs = df.select(
        col(langCol).as("blk_lang"),
        floor(col(lenCol) / bucketWidth).cast("long").as("blk_len"),
        col(idCol).as("_id"),
        array_distinct(Scrub.wordNgrams(col(textCol), n)).as("_g"))
      .withColumn("_n", size(col("_g")).cast("long"))
      .filter(col("_n") > 0)
      .localCheckpoint(false)

    // Prefix filter (Bayardo/Ma/Srikant's AllPairs): under ANY global total
    // order over grams, a pair with jac ≥ t must share at least one gram
    // within BOTH sides' first |x| − ⌈t·|x|⌉ + 1 grams (else the overlap is
    // ≤ ⌈t·|x|⌉ − 1 < t·|x| ≤ t·|A∪B|). Ordering by (document frequency
    // asc, gram) puts the RAREST grams in the prefix, so unrelated docs
    // almost never collide — candidates stay ~linear where the plain
    // block-quadratic was O(m²) per block. Candidates join on the gram
    // STRING, not a hash: over-approximation only, a qualifying pair
    // cannot be lost.
    val tok = docs.select(col("blk_lang"), col("blk_len"), col("_id"),
      col("_n"), explode(col("_g")).as("_gram"))
    // Document frequency: only df > 1 grams are kept — hapax grams (the
    // heavy tail of any real n-gram vocabulary) coalesce back to df = 1
    // after the left join, which is exactly the value the inner join would
    // have carried, so the prefix ORDER is bit-identical. The checkpoint
    // makes the aggregate's true size knowable: it is counted once, and
    // the join side is broadcast only below `maxBroadcastGrams` (an
    // explicit hint would bypass autoBroadcastJoinThreshold and ride a
    // corpus-sized vocabulary into the driver / Spark's 8 GB broadcast
    // hard cap); above the cap it degrades to a shuffle join instead of
    // failing the job.
    val dfreq = tok.groupBy("_gram").agg(count(lit(1)).as("_df"))
      .filter(col("_df") > 1)
      .localCheckpoint(false)
    val dfreqSide = if (dfreq.count() <= maxBroadcastGrams) broadcast(dfreq) else dfreq
    // The rank runs over ALL of a doc's grams (prefix positions are defined
    // against the full (df, gram)-sorted list), but only df > 1 rows
    // survive into the index: a hapax gram occurs in exactly one document,
    // so it cannot witness a candidate pair — dropping df = 1 rows AFTER
    // ranking shrinks the self-join input to the shared-vocabulary slice
    // without losing any qualifying pair (the witnessing shared gram has
    // df ≥ 2 and sits inside both prefixes by the AllPairs bound).
    // Checkpointing the slim index keeps the self-join below from
    // evaluating the rank pipeline twice.
    val pref = tok.join(dfreqSide, Seq("_gram"), "left")
      .withColumn("_df", coalesce(col("_df"), lit(1L)))
      .withColumn("_r", row_number().over(
        Window.partitionBy("_id").orderBy(col("_df"), col("_gram"))))
      .filter(col("_r") <= col("_n") - ceil(lit(threshold) * col("_n")) + lit(1) &&
        col("_df") > 1)
      .select(col("blk_lang"), col("blk_len"), col("_gram"),
        col("_id"), col("_n"), col("_r"))
      .localCheckpoint(false)

    // Same block + shared prefix gram + the size bound (jac ≥ t implies
    // min ≥ t·max since jac ≤ min/max) → candidate pairs, deduped by the
    // groupBy below.
    //
    // Positional filter (PPJoin, Xiao et al. 2008 §3.2), applied at the
    // pair's FIRST shared prefix gram: ranks are monotone in the global
    // (df, gram) order, so min(_ra)/min(_rb) over a pair's shared
    // occurrences are that first gram's positions in BOTH docs, and every
    // common gram sits at-or-after it in both lists — hence
    // |A∩B| ≤ 1 + min(n_a − ra, n_b − rb). jac ≥ t needs
    // |A∩B| ≥ t·(n_a+n_b)/(1+t); candidates whose bound can't reach it
    // never pay the exact intersect. The comparison is the UN-ceiled real
    // bound minus an epsilon: strictly weaker than the integer ceil (so a
    // qualifying pair can never be dropped by a floating-point wobble),
    // and the lost pruning is at most the one knife-edge candidate.
    val alpha = lit(threshold / (1.0 + threshold)) *
      (col("n_a") + col("n_b")).cast("double") - lit(1e-9)
    val cand = pref.select(col("blk_lang"), col("blk_len"), col("_gram"),
        col("_id").as("id_a"), col("_n").as("n_a"), col("_r").as("_ra"))
      .join(pref.select(col("blk_lang"), col("blk_len"), col("_gram"),
        col("_id").as("id_b"), col("_n").as("n_b"), col("_r").as("_rb")),
        Seq("blk_lang", "blk_len", "_gram"))
      .filter(col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")).cast("double") >=
          lit(threshold) * greatest(col("n_a"), col("n_b")).cast("double"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(min(col("_ra")).as("_ra"), min(col("_rb")).as("_rb"))
      .filter(lit(1.0) +
        least(col("n_a") - col("_ra"), col("n_b") - col("_rb")).cast("double") >= alpha)
      .select("id_a", "id_b", "n_a", "n_b")

    // Exact verification, once per surviving candidate: ONE array_intersect
    // on the true gram strings; |A∪B| = |A|+|B|−|A∩B| for distinct sets, so
    // array_union never runs. Zero estimation error end to end.
    val inter = size(array_intersect(col("g_a"), col("g_b"))).cast("double")
    cand
      .join(docs.select(col("_id").as("id_a"), col("_g").as("g_a")), "id_a")
      .join(docs.select(col("_id").as("id_b"), col("_g").as("g_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (inter / ((col("n_a") + col("n_b")).cast("double") - inter)).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Asymmetric containment pairs — the subset-relation detector the
    * symmetric Jaccard family structurally misses: an excerpt inside a
    * roundup, a quoted abstract, a README embedded in a monorepo dump
    * scores `C(A→B) = |A∩B| / |A| ≈ 1` while its Jaccard `|A∩B| / |A∪B|`
    * is tiny because |B| >> |A|. The standard dedup decision for such
    * pairs is "drop A, keep B" — which requires the DIRECTED relation
    * this operator emits: `(id_a, id_b, n_shared, containment)` where
    * `containment` is of A's distinct word-`n`-gram set in B's, one row
    * per direction that clears `threshold` (both directions qualify only
    * for near-identical sets).
    *
    * Candidate generation is the containment PREFIX FILTER (the AllPairs
    * bound restated for overlap, Bayardo et al. 2007): if `C(A→B) ≥ t`
    * then A has at most ⌊(1−t)·|A|⌋ unshared grams, so among A's first
    * ⌊(1−t)·|A|⌋+1 grams under the global (document-frequency asc, gram)
    * order — its RAREST grams — at least one is shared with B, by
    * pigeonhole. The probe side therefore explodes only that prefix
    * (a handful of grams per document at high t) against an index of all
    * gram instances with df ≤ `maxBucket`; candidate volume is
    * `Σ_docs prefixLen · df ≤ docs · prefixLen · maxBucket` — LINEAR in
    * the corpus with the cap a constant, vs the Σ df² of a plain shared-
    * gram self-join. RECALL CONTRACT: lossless except when EVERY gram in
    * a qualifying A's rarest-prefix occurs in more than `maxBucket`
    * documents — all-boilerplate text, the regime where a pair-level
    * verdict stops being useful ([[Scrub.docFrequencyScrub]] owns it).
    * Survivors pay ONE exact `array_intersect` on the true gram sets —
    * integer sizes, one integer-over-integer division: zero estimation
    * error and bit-identical cross-engine (the q116 oracle replays grams,
    * ranks, cap and division literally; `threshold` enters `ceil` as a
    * DOUBLE in both engines — a bare SQL decimal literal would ceil
    * differently at exact multiples).
    *
    * Scale shape for 100 TB: per-doc gram sets are map-side array ops
    * behind a lazy localCheckpoint (feeds the gram stream AND both verify
    * sides — the q73 lesson); document frequency is one vocabulary-keyed
    * aggregation; the ranked gram stream is checkpointed once and sliced
    * into probe prefix + index (else the rank pipeline runs twice); the
    * verify joins key on the doc id. The `|B| ≥ ⌈t·|A|⌉` size bound
    * (|A∩B| ≤ |B|) prunes candidates before any array touches. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.9,
                       maxBucket: Int = 64): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold ($threshold) must be in (0, 1]")
    require(maxBucket >= 2, s"maxBucket ($maxBucket) must be >= 2 — no " +
      "pair can form inside a 1-doc bucket")
    val docs = df.select(col(idCol).as("_id"),
        array_distinct(Scrub.wordNgrams(col(textCol), n)).as("_g"))
      .withColumn("_n", size(col("_g")).cast("long"))
      .filter(col("_n") > 0)
      .localCheckpoint(false)
    val tok = docs.select(col("_id"), col("_n"), explode(col("_g")).as("_gram"))
    val dfreq = tok.groupBy("_gram").agg(count(lit(1)).as("_df"))
    // rank EVERY gram of a doc by (df, gram) — prefix positions are defined
    // against the full ordered list (a df-1 gram occupies its slot even
    // though it can never witness); filter eligibility AFTER ranking
    val ranked = tok.join(dfreq, Seq("_gram"))
      .withColumn("_r", row_number().over(
        Window.partitionBy("_id").orderBy(col("_df"), col("_gram"))))
      .filter(col("_df") > 1 && col("_df") <= maxBucket)
      .localCheckpoint(false)
    val prefix = ranked
      .filter(col("_r") <= col("_n") - ceil(lit(threshold) * col("_n")) + lit(1))
      .select(col("_gram"), col("_id").as("id_a"), col("_n").as("n_a"))
    val index = ranked.select(col("_gram"), col("_id").as("id_b"), col("_n").as("n_b"))
    val cand0 = prefix.join(index, Seq("_gram"))
      .filter(col("id_a") =!= col("id_b") &&
        col("n_b") >= ceil(lit(threshold) * col("n_a")))
      .select("id_a", "id_b").distinct()
    // pin the verification parallelism to the cluster's core count: AQE
    // coalesces the candidate shuffle by BYTES, but each row pays an
    // array_intersect over two full gram arrays — bytes-right 8-task
    // layouts serialize the cpu-heavy verify (measured: 5.5 s of q116's
    // 7.9 s in two under-parallel join stages). defaultParallelism is the
    // total executor core count, so the pin scales with the cluster, and
    // the explicit count keeps AQE from re-coalescing a compute-bound
    // stage by its (small) bytes.
    val cand = cand0.repartition(
      df.sparkSession.sparkContext.defaultParallelism, col("id_a"))
    val inter = size(array_intersect(col("g_a"), col("g_b"))).cast("long")
    cand
      .join(docs.select(col("_id").as("id_a"), col("_g").as("g_a"),
        col("_n").as("_na")), "id_a")
      .join(docs.select(col("_id").as("id_b"), col("_g").as("g_b")), "id_b")
      .select(col("id_a"), col("id_b"), inter.as("n_shared"),
        (inter.cast("double") / col("_na").cast("double")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Edit-distance self-join: every pair of strings within Levenshtein
    * distance `maxDist`, found WITHOUT the all-pairs quadratic — the
    * segment-filter candidate generation of PassJoin (Li, Deng, Feng,
    * Wang, "PASS-JOIN: a partition-based method for similarity joins",
    * PVLDB 2011). Pigeonhole: split the shorter string s into
    * `maxDist + 1` disjoint segments; any t with `ed(s,t) ≤ maxDist`
    * leaves at least one segment un-edited, so t CONTAINS that segment
    * verbatim, shifted by at most `maxDist` positions. Candidates are an
    * equi-join on `(|s|, segment index, segment content)` between each
    * string's segments (index side) and each string's shifted substrings
    * at the segment geometries of lengths `|t|−maxDist … |t|` (probe
    * side); survivors verify with one exact `levenshtein`.
    *
    * Output: `(id_a, id_b, dist)` with `id_a < id_b`, one row per pair
    * with `dist ≤ maxDist`. Strings shorter than `maxDist + 1` chars are
    * excluded BY CONTRACT (a segment must be ≥ 1 char; near-dup keys that
    * short carry no signal — pad or bucket them upstream). Pair roles
    * are deterministic: shorter string indexes, longer probes; equal
    * lengths tie on id, so no pair is generated twice from swapped roles.
    *
    * Scale shape for 100 TB: index is `maxDist+1` rows per string, probe
    * `≤ (maxDist+1)²(2·maxDist+1)` rows per string — both LINEAR in the
    * corpus; the single shuffle is the selective equi-join on segment
    * content (shared-segment groups play the role of LSH buckets — skew
    * only where many strings share an identical segment at the same
    * geometry, i.e. real near-dup mass). No all-pairs stage anywhere: the
    * verify set is the candidate set, already near-linear, unlike the
    * quadratic-by-contract [[ngramJaccardPairs]] family.
    *
    * `salt` (default 1 = off) parallelizes HOT segment buckets: a corpus
    * where thousands of near-identical keys share one `(L, i, seg)` bucket
    * puts that bucket's `depth_index × depth_probe` candidate emission in
    * ONE join task — AQE's skew split never fires because it triggers on
    * shuffle-partition INPUT bytes (a few MB here) while the cost is the
    * OUTPUT row count. With `salt = s`, probe keys are hash-sharded into
    * `s` lanes and the (cheap, `maxDist+1` rows/key) index side is
    * replicated into every lane — identical join result, hot-bucket
    * emission spread over `s` tasks. Candidate VOLUME is unchanged: salt
    * buys wall-clock via parallelism, not fewer candidates; the volume
    * knob is the distinct-key collapse above. */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        maxDist: Int = 2, salt: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4,
      s"maxDist ($maxDist) must be in [1, 4] — probe fan-out grows cubically")
    require(salt >= 1 && salt <= 1024,
      s"salt ($salt) must be in [1, 1024] — the index side is replicated salt times")
    val m = maxDist + 1
    val docs = df.select(col(idCol).cast("long").as("_id"),
        col(textCol).as("_t"), length(col(textCol)).as("_len"))
      .filter(col("_len") >= m)
      .localCheckpoint(false)
    // DISTINCT keys drive the segment join (round-11 skew stress: a
    // Zipf-heavy corpus with an 889-deep identical key put that bucket's
    // depth² through every segment bucket — 110M candidate rows at 20k
    // strings; collapsing to distinct keys removes the duplicate-mass
    // quadratic from the JOIN entirely). Duplicate ids re-expand after
    // verification: within-key pairs at dist 0, cross-key pairs from the
    // verified key pairs × member lists. The OUTPUT is still pair-count
    // sized — that part is the contract; callers who don't need dist-0
    // pairs enumerated should collapse exact dups upstream ([[exact]])
    // and join-dedup on the representative instead.
    val keys = docs.select(col("_t"), col("_len")).distinct()
      .localCheckpoint(false)
    // segment i of a length-L string starts at floor(i·L/m), ends at
    // floor((i+1)·L/m) — exact in doubles for any realistic length
    def segStart(L: Column, i: Int): Column =
      floor(lit(i.toDouble) * L.cast("double") / lit(m.toDouble)).cast("int")
    def segLen(L: Column, i: Int): Column =
      segStart(L, i + 1) - segStart(L, i)
    val index = keys.select(col("_t").as("_ta"),
        col("_len").as("_la"),
        explode(array((0 until m).map { i =>
          struct(lit(i).as("i"),
            col("_t").substr(segStart(col("_len"), i) + 1,
              segLen(col("_len"), i)).as("seg"))
        }: _*)).as("_s"))
      .select(col("_ta"), col("_la"), col("_s.i").as("_i"),
        col("_s.seg").as("_seg"))
    val probe = keys.select(col("_t").as("_tb"),
        col("_len").as("_lb"),
        explode(sequence(greatest(col("_len") - maxDist, lit(m)),
          col("_len"))).as("_L"))
      .select(col("_tb"), col("_lb"), col("_L"),
        explode(array((for { i <- 0 until m; d <- -maxDist to maxDist }
          yield {
            val st = segStart(col("_L"), i) + d
            val ln = segLen(col("_L"), i)
            struct(lit(i).as("i"), st.as("st"), ln.as("ln"))
          }): _*)).as("_s"))
      .filter(col("_s.st") >= 0 &&
        col("_s.st") + col("_s.ln") <= col("_lb"))
      .select(col("_tb"), col("_lb"), col("_L"), col("_s.i").as("_i"),
        col("_tb").substr(col("_s.st") + 1, col("_s.ln")).as("_sub"))
    // role split on (length, key): shorter indexes, longer probes; equal
    // lengths tie on the key string — each unordered key pair generated
    // exactly once, id-free
    // salt > 1 also PINS the join's partition count: the join input is a
    // few MB of keys (AQE's coalesce advisory would fold it to ~1
    // partition) while its OUTPUT under adversarial near-dup mass is
    // 10⁸+ candidate rows — cost AQE cannot see. An explicit-count
    // repartition on the exact join keys satisfies the join's
    // distribution requirement as-is (no further exchange for AQE to
    // coalesce), so hot-bucket emission actually runs wide.
    val (indexS, probeS) =
      if (salt == 1) (index, probe)
      else {
        val n = df.sparkSession.sparkContext.defaultParallelism * 2
        (index.withColumn("_sl", explode(array((0 until salt).map(lit): _*)))
          .repartition(n, col("_la"), col("_i"), col("_seg"), col("_sl")),
          probe.withColumn("_sl",
            pmod(xxhash64(col("_tb")), lit(salt.toLong)).cast("int"))
            .repartition(n, col("_L"), col("_i"), col("_sub"), col("_sl")))
      }
    val saltCond =
      if (salt == 1) lit(true) else indexS("_sl") === probeS("_sl")
    val keyPairs = indexS.join(probeS,
        indexS("_la") === probeS("_L") && indexS("_i") === probeS("_i") &&
          indexS("_seg") === probeS("_sub") && saltCond)
      .filter(col("_la") < col("_lb") ||
        (col("_la") === col("_lb") && col("_ta") < col("_tb")))
      .select(col("_ta"), col("_tb")).distinct()
      // thresholded levenshtein runs the banded O(maxDist·len) algorithm
      // and returns −1 past the band — same surviving pairs and distances
      // as the full O(len²) form, at ~len/maxDist of the verify cost
      .withColumn("dist", levenshtein(col("_ta"), col("_tb"), maxDist))
      .filter(col("dist") >= 0)
    val members = docs.select(col("_t"), col("_id"))
    val cross = keyPairs
      .join(members.select(col("_t").as("_ta"), col("_id").as("_ia")), "_ta")
      .join(members.select(col("_t").as("_tb"), col("_id").as("_ib")), "_tb")
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"), col("dist"))
    val within = members.select(col("_t"), col("_id").as("id_a"))
      .join(members.select(col("_t"), col("_id").as("id_b")), "_t")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).as("dist"))
    cross.unionByName(within)
  }

  /** Exact repeated-passage detection — the "exact substring dedup" of
    * Lee et al., *Deduplicating Training Data Makes Language Models
    * Better* (ACL 2022), re-expressed for Spark: instead of a suffix array
    * (single-machine, pointer-chasing), every position's n-token window
    * hashes to a 128-bit key; a window whose hash occurs `minCount`+ times
    * ANYWHERE in the corpus (another document or the same one — so
    * within-doc boilerplate repetition counts) is a repeated window, and a
    * document's overlapping/adjacent repeated windows merge into maximal
    * spans (gaps-and-islands: consecutive marked positions ≤ n apart chain
    * into one passage). Output: one row per `(id, span)` —
    * `(idCol, span_start, span_end, n_windows)`, token positions 1-based
    * inclusive; every span is a passage of ≥ n tokens that the corpus
    * contains at least `minCount` times. Callers slice the spans out of
    * the text (or drop the document) downstream.
    *
    * Tokenization is lowercased whitespace splitting — the md5 window keys
    * are plain string hashes, so the q81 oracle recomputes the identical
    * marking in DuckDB (no sketching, no collisions changing semantics:
    * a 128-bit collision over ≤ 2^50 windows is ~2^-28).
    *
    * Scale shape: the window stream is one slim (hash, id, pos) row per
    * token position — corpus-token-sized but column-pruned; it is
    * materialized ONCE behind a lazy localCheckpoint (the q73 lesson: the
    * stream feeds both the frequency count and the mark join, and without
    * a barrier the tokenize+md5 map — the dominant cost — runs twice). The
    * frequency aggregate and the mark join both key on the hash, so AQE
    * reuses one exchange layout; the island merge shuffles only MARKED
    * positions by document. No driver-side state at any step. */
  def repeatedPassages(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 8, minCount: Long = 2L): DataFrame = {
    require(n >= 1, s"window size n ($n) must be >= 1")
    require(minCount >= 2, s"minCount ($minCount) must be >= 2 — every " +
      "window occurs once trivially")
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"), t => t =!= "")
    val base = df.select(col(idCol).as("_id"), toks.as("_t"))
      .filter(size(col("_t")) >= n)
    val wins = base
      .select(col("_id"), posexplode(
        transform(sequence(lit(1), size(col("_t")) - lit(n - 1)),
          i => md5(concat_ws(" ", slice(col("_t"), i, lit(n)))))))
      .select(col("_id"), (col("pos") + 1).cast("long").as("_p"),
        col("col").as("_wh"))
      .localCheckpoint(false)
    val repeated = wins.groupBy("_wh").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount).select("_wh")
    val marked = wins.join(repeated, "_wh").select("_id", "_p")
    val byDoc = Window.partitionBy("_id").orderBy("_p")
    marked
      // first position of a doc: lag is null -> NULL <= n is null -> new island
      .withColumn("_brk", when(col("_p") - lag("_p", 1).over(byDoc) <= n, 0)
        .otherwise(1))
      .withColumn("_grp", sum("_brk").over(byDoc))
      .groupBy(col("_id"), col("_grp"))
      .agg(min("_p").as("span_start"),
        (max(col("_p")) + lit(n - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("_id").as(idCol), col("span_start"), col("span_end"),
        col("n_windows"))
  }

  /** Exact duplicated-span REMOVALS — the classic LLM-curation operator
    * of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499) re-expressed relationally: the
    * suffix-array dedup's bucket sort at depth k IS a sorted k-gram
    * equality join. Every corpus position whose k-token gram occurs
    * `minCount`+ times anywhere — by EXACT token-sequence equality, not
    * a hash (contrast [[repeatedPassages]], which marks md5'd windows
    * and keeps every occurrence) — is a duplicate hit; per duplicated
    * gram the lexicographically-first (doc, position) occurrence is the
    * canonical copy that survives, every OTHER occurrence is marked for
    * removal, and marked positions merge into per-document spans
    * ([[repeatedPassages]]' gaps-and-islands; gap > k breaks).
    *
    * Output `(idCol, span_start, span_end, n_grams)`: 1-based token
    * positions, `span_end` inclusive ([[repeatedPassages]]' convention)
    * — the tokens to delete from each listed doc. Every duplicated
    * gram's canonical START position is never itself marked (removal is
    * all-but-one at the gram level; as in the paper, a removed span may
    * still clip the tail of an overlapping retained window).
    *
    * Scale shape: the gram stream is one slim (gram, id, pos) row per
    * token position, materialized once behind a lazy localCheckpoint
    * (it feeds both the canonical aggregate and the mark join — the
    * [[repeatedPassages]] barrier lesson). The canonical occurrence is
    * `groupBy(gram).agg(min(struct(id, pos)))` — map-side combinable,
    * NEVER a row_number window over the gram (a viral boilerplate gram
    * would serialize one task); the mark join keys on the same gram so
    * AQE reuses the exchange layout and skew-splits a hot gram's join
    * side. The island merge shuffles only marked positions by document,
    * bounded by doc length. */
  def exactSubstringRemovals(df: DataFrame, idCol: String, textCol: String,
                             k: Int = 25, minCount: Long = 2L): DataFrame = {
    require(k >= 2, s"gram length k ($k) must be >= 2")
    require(minCount >= 2, s"minCount ($minCount) must be >= 2 — every " +
      "gram occurs once trivially")
    val toks = filter(split(TextAnalysis.normalized(col(textCol)), " "),
      t => t =!= "")
    val base = df.select(col(idCol).as("_id"), toks.as("_t"))
      .filter(size(col("_t")) >= k)
    val wins = base
      .select(col("_id"), posexplode(
        transform(sequence(lit(1), size(col("_t")) - lit(k - 1)),
          i => concat_ws(" ", slice(col("_t"), i, lit(k))))))
      .select(col("_id"), (col("pos") + 1).cast("long").as("_p"),
        col("col").as("_g"))
      .localCheckpoint(false)
    val canon = wins.groupBy("_g")
      .agg(count(lit(1)).as("_c"), min(struct(col("_id"), col("_p"))).as("_m"))
      .filter(col("_c") >= minCount)
      .select(col("_g"), col("_m._id").as("_cid"), col("_m._p").as("_cp"))
    val marked = wins.join(canon, "_g")
      .filter(!(col("_id") === col("_cid") && col("_p") === col("_cp")))
      .select("_id", "_p")
    val byDoc = Window.partitionBy("_id").orderBy("_p")
    marked
      .withColumn("_brk", when(col("_p") - lag("_p", 1).over(byDoc) <= k, 0)
        .otherwise(1))
      .withColumn("_grp", sum("_brk").over(byDoc))
      .groupBy(col("_id"), col("_grp"))
      .agg(min("_p").as("span_start"),
        (max(col("_p")) + lit(k - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("_id").as(idCol), col("span_start"), col("span_end"),
        col("n_grams"))
  }

  /** Two-table fuzzy string join: rows from `left` and `right` whose
    * character-set Jaccard meets `threshold`, candidate space blocked by
    * (lang, length-bucket) exactly like [[blockedJaccardPairs]]. The
    * entity-matching shape — link records across datasets by approximate
    * string equality. Both inputs use the same column names (rename before
    * calling); output is (id_l, id_r, jac), all blocked matches including
    * equal ids. Per-doc bitmask below the join, 8 popcounts per pair. */
  def fuzzyJoinJaccard(left: DataFrame, right: DataFrame, idCol: String,
                       textCol: String, langCol: String, lenCol: String,
                       bucketWidth: Int = 64, threshold: Double = 0.8): DataFrame =
    charMasks(left, idCol, textCol, langCol, lenCol, bucketWidth, "l")
      .join(charMasks(right, idCol, textCol, langCol, lenCol, bucketWidth, "r"),
        Seq("blk_lang", "blk_len"))
      .select(col("id_l"), col("id_r"), maskJaccardLR.as("jac"))
      .filter(col("jac") >= threshold)

  /** Per-document character bitmask, keyed for a blocked join.
    *
    * ASCII codepoints (0..127) become a 4×32-bit bitmask — per-pair work is
    * then 8 AND/OR + 8 popcounts instead of hash-set intersections; the
    * rare non-ASCII chars ride in a (usually empty) array so semantics stay
    * exact for any input. Masks build via explode → bit_or aggregation so
    * the char split runs once per doc (an inline per-mask formulation gets
    * the split duplicated 6× by projection collapse). Variable shifts
    * don't exist as Columns; pow(2, code) is exact for code < 32. */
  private def charMasks(df: DataFrame, idCol: String, textCol: String,
                        langCol: String, lenCol: String, bucketWidth: Int,
                        tag: String): DataFrame = {
    val exploded = df.select(
      col(idCol).as("id"),
      col(langCol).as("blk_lang"),
      floor(col(lenCol) / bucketWidth).cast("long").as("blk_len"),
      explode(array_distinct(filter(split(col(textCol), ""), c => c =!= ""))).as("ch"))
      .withColumn("code", ascii(col("ch")))
    def maskAgg(kk: Int): Column = bit_or(
      when(col("code") >= kk * 32 && col("code") < (kk + 1) * 32,
        pow(lit(2.0), (col("code") - lit(kk * 32)).cast("double")).cast("long"))
        .otherwise(0L))
    exploded.groupBy("id", "blk_lang", "blk_len")
      .agg(
        maskAgg(0).as("m0"), maskAgg(1).as("m1"), maskAgg(2).as("m2"), maskAgg(3).as("m3"),
        sort_array(collect_list(when(col("code") >= 128, col("ch")))).as("xa"))
      .select(Seq(col("blk_lang"), col("blk_len"),
        col("id").as(s"id_$tag"), col("xa").as(s"xa_$tag")) ++
        (0 until 4).map(kk => col(s"m$kk").as(s"m${kk}_$tag")): _*)
  }

  private def maskJaccardFor(a: String, b: String): Column = {
    val inter = (0 until 4).map(kk =>
      bit_count(col(s"m${kk}_$a").bitwiseAND(col(s"m${kk}_$b")))).reduce(_ + _) +
      size(array_intersect(col(s"xa_$a"), col(s"xa_$b")))
    val union = (0 until 4).map(kk =>
      bit_count(col(s"m${kk}_$a").bitwiseOR(col(s"m${kk}_$b")))).reduce(_ + _) +
      size(array_union(col(s"xa_$a"), col(s"xa_$b")))
    inter.cast("double") / union.cast("double")
  }
  private def maskJaccard: Column = maskJaccardFor("a", "b")
  private def maskJaccardLR: Column = maskJaccardFor("l", "r")

  /** LSH banding parameter plan (Leskovec, Rajaraman & Ullman, "Mining
    * of Massive Datasets" §3.4.3 — the S-curve analysis): given an
    * OBSERVED pair-similarity sample and a target threshold, evaluate
    * every (bands b, rows r) factorization of `nHashes` by its expected
    * false-positive / false-negative candidate mass
    *   `P(collide | s) = 1 − (1 − sʳ)ᵇ`
    *   `FP = Σ_{s < t} h(s)·P(s)`, `FN = Σ_{s ≥ t} h(s)·(1 − P(s))`
    * over an `nBins`-bin histogram of the sample, and mark the
    * minimum-total-error plan — the index advisor that turns "pick b
    * and r" from folklore into a measured decision before a corpus-
    * scale [[minhashCandidatePairs]] run.
    *
    * Determinism: bins are exact integer floors; every power is an
    * UNROLLED multiplication chain (no `pow` — `xʸ = e^{y·ln x}` would
    * hang cross-engine bit-identity on two libm calls), starting from
    * 1.0 whose first multiply is exact; the FP/FN sums fold in BIN
    * order over sorted collects (≤ nBins terms); `p_at_threshold` is
    * the same chain evaluated driver-side and planted as a literal in
    * both plans. Tie on total error breaks to the smaller band count.
    *
    * Scale shape: ONE histogram aggregation over the pair sample
    * (map-side combined to ≤ nBins rows, reused by every branch via a
    * lazy localCheckpoint), then divisor-count bounded 1-row branches.
    * Output: one row per factorization `(b, r, p_at_threshold, exp_fp,
    * exp_fn, total_err, chosen)`. */
  def lshParameterPlan(pairs: DataFrame, simCol: String, nHashes: Int,
                       threshold: Double, nBins: Int = 20): DataFrame = {
    require(nHashes >= 1 && nHashes <= 512,
      s"nHashes ($nHashes) must be in [1, 512]")
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold ($threshold) must be in (0,1)")
    require(nBins >= 2 && nBins <= 100, s"nBins ($nBins) out of range")
    val hist = pairs.filter(col(simCol).isNotNull)
      .select(least(floor(col(simCol).cast("double") * nBins).cast("long"),
        lit(nBins - 1L)).as("_bin"))
      .groupBy("_bin").agg(count(lit(1)).as("_cnt"))
      .localCheckpoint(false) // one histogram, divisor-many readers
    def powD(x: Double, k: Int): Double =
      (1 to k).foldLeft(1.0)((a, _) => a * x)
    def powC(x: Column, k: Int): Column =
      (1 to k).foldLeft(lit(1.0): Column)((a, _) => a * x)
    val halfw = 0.5 / nBins
    val grid = (1 to nHashes).filter(nHashes % _ == 0)
      .map(r => (nHashes / r, r))
    val branches = grid.map { case (b, r) =>
      val pAtT = 1.0 - powD(1.0 - powD(threshold, r), b)
      val center = (col("_bin").cast("double") * lit(2.0) + lit(1.0)) *
        lit(halfw)
      val pCol = lit(1.0) - powC(lit(1.0) - powC(center, r), b)
      hist
        .select(col("_bin"),
          when(center < threshold, col("_cnt").cast("double") * pCol)
            .otherwise(lit(0.0)).as("_fp"),
          when(center >= threshold,
            col("_cnt").cast("double") * (lit(1.0) - pCol))
            .otherwise(lit(0.0)).as("_fn"))
        .agg(
          aggregate(sort_array(collect_list(struct(col("_bin"),
            col("_fp").as("f")))), lit(0.0), (a, t) => a + t("f"))
            .as("exp_fp"),
          aggregate(sort_array(collect_list(struct(col("_bin"),
            col("_fn").as("f")))), lit(0.0), (a, t) => a + t("f"))
            .as("exp_fn"))
        .select(lit(b).as("b"), lit(r).as("r"),
          lit(pAtT).as("p_at_threshold"), col("exp_fp"), col("exp_fn"),
          (col("exp_fp") + col("exp_fn")).as("total_err"))
    }
    val all = branches.reduce(_.unionByName(_))
    // divisor-count-sized table: the unpartitioned window is bounded
    val w = Window.orderBy(col("total_err"), col("b"))
    all.withColumn("chosen", row_number().over(w) === 1)
  }
}
