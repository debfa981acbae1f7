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
    * Shape: explode shingles → hash each once → groupBy(id) with k `min`
    * partial aggregates. The aggregation is a materialization barrier, so
    * the shingle hashing runs exactly once per shingle — a naive per-row
    * nested-`transform` expression gets duplicated k×bands times by
    * Catalyst's projection collapse (measured 25× slower). Partial
    * map-side mins mean the shuffle carries one k-wide row per doc. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 32, shingleN: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), shingleN)).as("sh"))
      .select(col("id"), pmod(xxhash64(col("sh")), lit(4294967296L)).as("h32"))
    hashed.groupBy("id").agg(
      array(hashParams(k).map { case (a, b) =>
        min(pmod(lit(a) * col("h32") + lit(b), lit(MinhashPrime)))
      }: _*).as("sig"))
  }

  /** LSH candidate pairs: signatures split into `bands` bands; docs sharing
    * any full band land in the same bucket; pairs are emitted per bucket
    * with their estimated (signature-agreement) similarity. */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 32, bands: Int = 8, shingleN: Int = 3): DataFrame = {
    val rows = k / bands
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleN)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(array_join(transform(
        slice(col("sig"), b * rows + 1, rows), x => x.cast("string")), ",")).as("bucket"))
    }
    val banded = sigs.select(
      col("id"), col("sig"),
      explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / lit(k.toDouble)).as("est_jaccard"))
      .distinct()
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over word hashes, computed per-row with higher-order
    * functions: each word votes ±1 on each bit of its xxhash64; the sign of
    * the per-bit sum becomes the signature bit. The 64 bit positions are
    * unrolled at plan-build time so every shift amount is a literal
    * (codegen-friendly; no variable-shift expression exists in the API). */
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
    * practice instead of O(n²). */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          langCol: String, lenCol: String,
                          bucketWidth: Int = 64, threshold: Double = 0.8): DataFrame = {
    val blocked = df.select(
      col(idCol).as("id"), col(textCol).as("text"),
      col(langCol).as("blk_lang"),
      floor(col(lenCol) / bucketWidth).cast("long").as("blk_len"))
    val l = blocked.select(col("blk_lang"), col("blk_len"), col("id").as("id_a"), col("text").as("text_a"))
    val r = blocked.select(col("blk_lang"), col("blk_len"), col("id").as("id_b"), col("text").as("text_b"))
    l.join(r, Seq("blk_lang", "blk_len"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        charJaccard(col("text_a"), col("text_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }
}
