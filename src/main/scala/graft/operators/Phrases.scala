package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Collocation mining by pointwise mutual information — PMI (Church &
  * Hanks, "Word Association Norms, Mutual Information, and Lexicography",
  * Computational Linguistics 1990): rank adjacent word pairs by how much
  * more often they co-occur than independence predicts,
  * `pmi(a,b) = ln p(a,b) − ln p(a) − ln p(b)`, with unigram probabilities
  * from token occurrences and bigram probabilities from adjacent-pair
  * occurrences. The classic phrase-mining signal for a training corpus:
  * top-PMI pairs above a count floor are the multi-word expressions
  * ("new york", "machine learning") a tokenizer or n-gram feature
  * pipeline should treat as units.
  *
  * The count floor (`minCount`) is PMI's standard low-frequency guard —
  * a pair seen twice where each word is seen twice scores a huge PMI that
  * is pure noise; the floor is applied to the PAIR count before any join,
  * so rare pairs never reach the scoring joins at all.
  *
  * Scale shape (corpus is the 100 TB side):
  *  - Two corpus passes, each ONE map-side-combinable aggregation whose
  *    output is type-bounded, never corpus-sized: unigram counts (vocab
  *    rows) and adjacent-pair counts (vocab² worst case, Zipf-tiny in
  *    practice). The unigram table is localCheckpointed once (it feeds
  *    both totals and two scoring joins) and broadcast when a COUNTED
  *    size clears `maxBroadcastRows` (the gated-broadcast convention of
  *    `Dedup.ngramJaccardPairs`), with a shuffle-join fallback above.
  *  - Selection is the O(k)-state [[TopK]] aggregate — map-side partial
  *    heaps over the already-type-bounded scored pairs, never a global
  *    sort.
  *
  * Cross-engine determinism: all counts are exact integers; the score is
  * a FIXED left-associated fold of three `ln`s of exact integer-ratio
  * doubles, rounded to 4 decimals; ranking orders by the ROUNDED score
  * with ties broken by the exact-integer [[TextAnalysis.polyHash]] of the
  * pair text — replayable in any engine. Two distinct pairs hashing to
  * the same (rounded score, hash) key would tie unstably, but that is a
  * ~1e-9 event per tied pair under the 1e9+7 modulus, and the oracle
  * orders by the same key.
  */
object Phrases {

  /** Top-`k` adjacent-pair collocations of `docs` by PMI as
    * `(rank, gram, pair_count, pmi)` — `gram` is the space-joined pair,
    * `pmi` rounded to 4 decimals, `rank` 1-based by
    * `(pmi DESC, polyHash(gram) ASC)`. Pairs with fewer than `minCount`
    * occurrences are excluded before scoring. */
  def pmiCollocations(docs: DataFrame, textCol: String, k: Int,
                      minCount: Long = 5L,
                      maxBroadcastRows: Long = 50000000L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(minCount >= 1L, s"minCount ($minCount) must be >= 1")
    val toks = docs
      .select(filter(split(TextAnalysis.normalized(col(textCol)), " "),
        c => c =!= "").as("_tk"))

    // Unigram counts: vocab-bounded output, pinned once — it feeds the n1
    // total and BOTH scoring joins below.
    val uniGate = Gates.countedBroadcast(
      toks.select(explode(col("_tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cu")), maxBroadcastRows)
    val uni = uniGate.pinned

    // Adjacent-pair counts: type-bounded output, pinned once — it feeds
    // the n2 total (which must include sub-floor pairs) and the floored
    // scoring stream.
    val bi = toks.filter(size(col("_tk")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("_tk")) - 1),
        i => struct(element_at(col("_tk"), i).as("a"),
          element_at(col("_tk"), i + 1).as("b")))).as("_p"))
      .groupBy(col("_p.a").as("a"), col("_p.b").as("b"))
      .agg(count(lit(1)).as("cb"))
      .localCheckpoint(false)

    val totals = uni.agg(sum("cu").as("n1"))
      .crossJoin(bi.agg(sum("cb").as("n2")))

    // Fixed fold: ln p(a,b) − ln p(a) − ln p(b), each ln arg one exact
    // integer-ratio double; left-associated exactly as the oracle writes it.
    val scored = bi.filter(col("cb") >= lit(minCount))
      .join(uniGate.of(uni.select(col("w").as("a"), col("cu").as("ca"))), Seq("a"))
      .join(uniGate.of(uni.select(col("w").as("b"), col("cu").as("cbw"))), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(concat(col("a"), lit(" "), col("b")).as("gram"), col("cb"),
        round(log(col("cb").cast("double") / col("n2").cast("double")) -
          log(col("ca").cast("double") / col("n1").cast("double")) -
          log(col("cbw").cast("double") / col("n1").cast("double")), 4)
          .as("pmi"))

    scored.agg(TopK.topK(k, col("pmi"),
        TextAnalysis.polyHash(col("gram")),
        struct(col("gram"), col("cb"), col("pmi"))).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("col.payload.gram").as("gram"),
        col("col.payload.cb").as("pair_count"),
        col("col.payload.pmi").as("pmi"))
  }

  /** Top-`k` collocations by Dunning's log-likelihood ratio (Dunning,
    * "Accurate Methods for the Statistics of Surprise and Coincidence",
    * Computational Linguistics 1993) — the G² test PMI's low-frequency
    * bias motivated: over the N adjacent-bigram events, each pair (a,b)
    * gets the 2×2 contingency table (first-word = a?, second-word = b?)
    * and `G² = 2·Σ_cells k·ln(k·N / (row·col))` (empty cells contribute
    * 0). Unlike [[pmiCollocations]], G² GROWS with evidence — "of the"
    * outranks a twice-seen hapax pair — which is why Dunning's is the
    * collocation default in corpus toolkits.
    *
    * Marginals are BIGRAM-positional (count of a as first word, b as
    * second — rows/columns of the same N-event table), not corpus
    * unigram counts: the four cells then sum exactly to N and G² is a
    * true likelihood-ratio statistic.
    *
    * Scale shape mirrors pmiCollocations: one corpus tokenize pass into
    * type-bounded pair counts, marginals as two vocab-sized aggregates
    * of the PAIR table (no second corpus pass), gated broadcasts, TopK
    * heap selection — never a global sort.
    *
    * Determinism: counts and cell values are exact longs cast once;
    * each term is `k·ln((k·N)/(R·C))` in fixed operand order; the four
    * terms fold left-associated; the result rounds through
    * [[graft.functions.ExactRound.roundFloor]] at 6 (engine round()
    * disagrees at representable ties). Rank by `(llr DESC,
    * polyHash(gram))` — replayable ordering, same as PMI. Output:
    * `(rank, gram, pair_count, llr)`. */
  def llrCollocations(docs: DataFrame, textCol: String, k: Int,
                      minCount: Long = 5L,
                      maxBroadcastRows: Long = 50000000L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(minCount >= 1L, s"minCount ($minCount) must be >= 1")
    val toks = docs
      .select(filter(split(TextAnalysis.normalized(col(textCol)), " "),
        c => c =!= "").as("_tk"))
    val bi = toks.filter(size(col("_tk")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("_tk")) - 1),
        i => struct(element_at(col("_tk"), i).as("a"),
          element_at(col("_tk"), i + 1).as("b")))).as("_p"))
      .groupBy(col("_p.a").as("a"), col("_p.b").as("b"))
      .agg(count(lit(1)).as("cb"))
      .localCheckpoint(false) // marginals ×2 + total + scoring stream
    val faGate = Gates.countedBroadcast(
      bi.groupBy("a").agg(sum("cb").as("ra")), maxBroadcastRows)
    val sbGate = Gates.countedBroadcast(
      bi.groupBy("b").agg(sum("cb").as("cbt")), maxBroadcastRows)
    val totals = bi.agg(sum("cb").as("n2"))
    val nD = col("n2").cast("double")
    def term(kk: Column, r: Column, c: Column): Column =
      when(kk > lit(0.0), kk * log((kk * nD) / (r * c)))
        .otherwise(lit(0.0))
    val k11 = col("cb").cast("double")
    val k12 = (col("ra") - col("cb")).cast("double")
    val k21 = (col("cbt") - col("cb")).cast("double")
    val k22 = (col("n2") - col("ra") - col("cbt") + col("cb")).cast("double")
    val r1 = col("ra").cast("double")
    val r2 = (col("n2") - col("ra")).cast("double")
    val c1 = col("cbt").cast("double")
    val c2 = (col("n2") - col("cbt")).cast("double")
    val scored = bi.filter(col("cb") >= lit(minCount))
      .join(faGate.of(faGate.pinned), Seq("a"))
      .join(sbGate.of(sbGate.pinned), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(concat(col("a"), lit(" "), col("b")).as("gram"), col("cb"),
        graft.functions.ExactRound.roundFloor(
          lit(2.0) * (term(k11, r1, c1) + term(k12, r1, c2) +
            term(k21, r2, c1) + term(k22, r2, c2)), 6).as("llr"))
    scored.agg(TopK.topK(k, col("llr"),
        TextAnalysis.polyHash(col("gram")),
        struct(col("gram"), col("cb"), col("llr"))).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("col.payload.gram").as("gram"),
        col("col.payload.cb").as("pair_count"),
        col("col.payload.llr").as("llr"))
  }

  /** GloVe-style distance-weighted co-occurrence (Pennington, Socher &
    * Manning, "GloVe: Global Vectors for Word Representation", EMNLP
    * 2014 §3: "words d apart contribute 1/d to the count") — the
    * co-occurrence matrix an embedding-training pipeline builds before
    * any optimization. Harmonic weights are EXACT integers: scaled by
    * `lcm(1..window)` (window 4 → 12, 6, 4, 3), so the matrix sums as
    * longs and every replay is integer-for-integer; the reported
    * `cooc` divides the exact scaled sum by the one scale literal.
    * Pairs are canonical unordered `(least, greatest)` — GloVe's X is
    * symmetric — and same-word pairs (the diagonal) are kept.
    *
    * Selection: pairs below `minScaled` are cut, then the O(k)-state
    * [[TopK]] heap ranks by `(scaled DESC, polyHash(gram))` — the
    * [[pmiCollocations]] convention, never a global sort.
    *
    * Scale shape: one corpus tokenize pass fanning out ≤ window
    * struct rows per token position (flattened inline, no join), ONE
    * map-side-combined aggregation to the type-bounded pair table,
    * heap selection. Output: `(rank, gram, cooc_scaled, cooc)`. */
  def gloveCooc(docs: DataFrame, textCol: String, window: Int = 4,
                k: Int = 100, minScaled: Long = -1L): DataFrame = {
    require(window >= 1 && window <= 8, s"window ($window) out of range")
    require(k > 0, s"k must be positive: $k")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val scale = (1 to window).map(_.toLong).reduce((a, b) => a / gcd(a, b) * b)
    val floor0 = if (minScaled < 0L) 2L * scale else minScaled
    val weights = array((1 to window).map(d => lit(scale / d)): _*)
    val toks = docs
      .select(filter(split(TextAnalysis.normalized(col(textCol)), " "),
        c => c =!= "").as("_tk"))
    val pairs = toks.filter(size(col("_tk")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("_tk")) - 1),
        i => transform(
          sequence(lit(1), least(lit(window), size(col("_tk")) - i)),
          d => struct(
            least(element_at(col("_tk"), i),
              element_at(col("_tk"), i + d)).as("a"),
            greatest(element_at(col("_tk"), i),
              element_at(col("_tk"), i + d)).as("b"),
            element_at(weights, d).as("w")))))).as("_p"))
      .groupBy(col("_p.a").as("a"), col("_p.b").as("b"))
      .agg(sum(col("_p.w")).as("cooc_scaled"))
      .filter(col("cooc_scaled") >= floor0)
      .select(concat(col("a"), lit(" "), col("b")).as("gram"),
        col("cooc_scaled"),
        (col("cooc_scaled").cast("double") / lit(scale.toDouble))
          .as("cooc"))
    pairs.agg(TopK.topK(k, col("cooc_scaled"),
        TextAnalysis.polyHash(col("gram")),
        struct(col("gram"), col("cooc_scaled"), col("cooc"))).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("col.payload.gram").as("gram"),
        col("col.payload.cooc_scaled").as("cooc_scaled"),
        col("col.payload.cooc").as("cooc"))
  }
}
