package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.RationalArgMax

/** WordPiece merge training (Schuster & Nakajima 2012, ICASSP; the BERT
  * tokenizer's vocabulary algorithm as documented publicly by the
  * HuggingFace tokenizers course) — the THIRD trainer beside BPE
  * ([[Bpe]], frequency argmax) and unigram-LM ([[Unigram]], EM pruning).
  *
  * Same corpus representation and greedy merge application as BPE; the
  * difference is the SELECTION RULE: WordPiece merges the adjacent pair
  * maximizing `count(pair) / (count(left) · count(right))` — a
  * likelihood-ratio score that favors pairs whose parts rarely occur
  * apart, rather than the raw most-frequent pair.
  *
  * Scale shape (the [[Bpe.trainMerges]] contract):
  *  - ONE corpus-scale pass (the word-frequency aggregation); every merge
  *    iteration then runs on the DISTINCT-WORD table only.
  *  - Per iteration: one vocabulary-sized pair aggregation, one
  *    vocabulary-sized symbol aggregation, a broadcast join of the two,
  *    and a single-row exact argmax — [[graft.functions.RationalArgMax]],
  *    which cross-multiplies BigIntegers so the rational score ranks
  *    EXACTLY at any corpus size (double division collapses scores past
  *    53 mantissa bits; any scaled-integer key overflows at the den²
  *    collision bound). State is O(1) and map-side combinable, so the
  *    argmax shuffles one candidate per partition, not the pair table.
  *  - `localCheckpoint` truncates lineage so iteration i does not replay
  *    iterations 1..i−1.
  *
  * Determinism: counts are exact integers, the score comparison is exact
  * rational arithmetic, and score ties break to the smallest
  * `(left, right)` in binary string order — a total order, so every
  * engine (and the q319 unrolled-CTE oracle, which replays the argmax as
  * a HUGEINT cross-multiplication anti-join) picks the same sequence. */
object WordPiece {

  /** Train `merges` WordPiece rules over a word-frequency table
    * (`wordCol`, integer `weightCol`). Returns one row per learned rule:
    * `(step 1-based, left, right, merged, weight, left_count,
    * right_count)` — `weight` is the pair count and `left_count` /
    * `right_count` the standalone symbol counts at merge time (the score
    * is `weight / (left_count · right_count)`, kept as its exact integer
    * parts). Stops early when no adjacent pair remains. */
  def trainMerges(words: DataFrame, wordCol: String, weightCol: String,
                  merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 65536,
      s"merges ($merges) must be in [1, 65536]")
    val spark = words.sparkSession
    import spark.implicits._
    var syms = words
      .select(Bpe.charSymbols(col(wordCol)).as("syms"),
        col(weightCol).cast("long").as("weight"))
      .localCheckpoint(true)
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long, Long, Long)]
    var step = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      // standalone symbol counts (vocab-sized) — materialized once per
      // iteration: it feeds BOTH broadcast sides of the score join AND the
      // post-argmax (fl, fr) lookup, which otherwise re-ran the corpus
      // aggregation three more times per merge step
      val symFreq = syms
        .select(col("weight"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum("weight").as("f"))
        .localCheckpoint(false)
      // ... adjacent-pair counts (vocab-sized) ...
      val pairs = syms
        .select(col("weight"), col("syms"), posexplode(slice(col("syms"), lit(1),
          greatest(size(col("syms")) - 1, lit(0)))).as(Seq("pos", "l")))
        .withColumn("r", element_at(col("syms"), col("pos") + 2))
        .groupBy("l", "r").agg(sum("weight").as("w"))
      // ... scored by the exact rational w / (fl·fr); symFreq is
      // vocabulary-sized, so both join sides broadcast
      val top = pairs
        .join(broadcast(symFreq.select(col("s").as("l"), col("f").as("fl"))), "l")
        .join(broadcast(symFreq.select(col("s").as("r"), col("f").as("fr"))), "r")
        .agg(RationalArgMax.rationalArgMax(
          col("w"),
          col("fl").cast(DecimalType(38, 0)) * col("fr").cast(DecimalType(38, 0)),
          col("l"), col("r")).as("m"))
        .select(col("m.tie_a").as("l"), col("m.tie_b").as("r"),
          col("m.num").as("w"), col("m.den").as("d"))
        .filter(col("l").isNotNull)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val l = row.getString(0)
        val r = row.getString(1)
        val w = row.getLong(2)
        val d = row.getDecimal(3).toBigInteger
        // den = fl·fr; recover the parts for the report (both ≤ long by
        // construction — they are corpus occurrence counts)
        step += 1
        // fl and fr are not individually carried through the argmax
        // state; re-derive them with ONE bounded (≤2-row) lookup and
        // cross-check the product against the argmax denominator
        val freqs = symFreq.filter(col("s").isin(l, r)).collect()
          .map(x => x.getString(0) -> x.getLong(1)).toMap
        val (fl, fr) = (freqs(l), freqs(r))
        require(java.math.BigInteger.valueOf(fl)
          .multiply(java.math.BigInteger.valueOf(fr)) == d,
          s"argmax denominator $d != $fl * $fr")
        learned += ((step, l, r, l + r, w, fl, fr))
        syms = syms
          .withColumn("syms", Bpe.applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    learned.toSeq.toDF("step", "left", "right", "merged", "weight",
      "left_count", "right_count")
  }

  /** End-to-end: corpus → word frequencies → `merges` WordPiece rules. */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame =
    trainMerges(Bpe.wordFrequencies(df, textCol), "word", "weight", merges)

  /** The WordPiece SERVING vocabulary implied by a trained rule table
    * over a symbol universe: every single character seen by the trainer
    * plus every merged symbol — the piece set maximal-munch encoding
    * matches against. */
  def vocabulary(words: DataFrame, wordCol: String,
                 rules: DataFrame): DataFrame = {
    val chars = words
      .select(explode(Bpe.charSymbols(col(wordCol))).as("piece")).distinct()
    chars.unionByName(rules.select(col("merged").as("piece")).distinct())
      .distinct()
  }

  /** Maximal-munch (longest-match-first) WordPiece encoding + fertility
    * report — the published WordPiece SERVING rule (greedy longest vocab
    * piece at each position, left to right), which differs from BPE's
    * merge-replay encode. Words longer than `maxWordLen` are excluded in
    * both engines (the oracle unrolls one jump per position, so the
    * unroll must be finite). The vocabulary contains every single
    * character of every kept word by construction, so the munch always
    * advances and no unknown-token lane is needed.
    *
    * Scale shape: the expensive encode runs once per DISTINCT word
    * (vocabulary-sized); the piece set rides the plan as a broadcast
    * join per candidate length — zero driver loops over data. Returns
    * per-slice `(n_words, n_tokens, n_chars, tokens_per_word,
    * chars_per_token)`, each ratio ONE double division of exact
    * integer masses (the [[Bpe.fertility]] contract). */
  def fertility(df: DataFrame, textCol: String, sliceCols: Seq[String],
                vocab: DataFrame, maxPieceLen: Int,
                maxWordLen: Int): DataFrame = {
    require(sliceCols.nonEmpty, "sliceCols must name at least one column")
    require(maxPieceLen >= 1 && maxPieceLen <= 64,
      s"maxPieceLen ($maxPieceLen) must be in [1, 64]")
    require(maxWordLen >= 1 && maxWordLen <= 64,
      s"maxWordLen ($maxWordLen) must be in [1, 64]")
    val slices = sliceCols.map(col)
    val occ = df
      .select(slices :+ explode(split(trim(col(textCol)), "\\s+")).as("_w"): _*)
      .filter(col("_w") =!= "" && length(col("_w")) <= maxWordLen)
      .groupBy(col("_w") +: slices: _*).agg(count(lit(1)).as("_c"))
    // candidate (word, start, len) substrings present in the vocab → the
    // longest match at each start; pieces broadcast (vocabulary-sized)
    val cand = occ.select(col("_w")).distinct()
      .select(col("_w"), explode(sequence(lit(1), length(col("_w")))).as("_i"))
      .select(col("_w"), col("_i"),
        explode(sequence(lit(1), least(lit(maxPieceLen),
          length(col("_w")) - col("_i") + 1))).as("_k"))
      .select(col("_w"), col("_i"), col("_k"),
        substring(col("_w"), col("_i"), col("_k")).as("_p"))
      .join(broadcast(vocab.select(col("piece").as("_p"))), "_p")
      .groupBy("_w", "_i").agg(max("_k").as("_jump"))
    // walk the munch: collect each word's longest-match jump per start
    // into a map, then fold maxWordLen bounded steps — pure per-row
    // expression work after one vocabulary-sized aggregation
    val jumps = cand
      .groupBy("_w")
      .agg(map_from_arrays(collect_list(col("_i")),
        collect_list(col("_jump"))).as("_jm"))
    // runtime fold over maxWordLen dummy steps (aggregate's accumulator is
    // a lambda VARIABLE — a Scala-side foldLeft would inline the
    // accumulator subtree 4× per level, an exponential expression tree)
    val stepFold = aggregate(
      sequence(lit(1), lit(maxWordLen)),
      struct(lit(1).as("pos"), lit(0).as("n")),
      (acc, _) => {
        val pos = acc.getField("pos")
        when(pos > length(col("_w")), acc)
          .otherwise(struct(
            (pos + element_at(col("_jm"), pos)).as("pos"),
            (acc.getField("n") + 1).as("n")))
      })
    val ntok = jumps.select(col("_w"), stepFold.getField("n").as("_ntok"),
      stepFold.getField("pos").as("_endpos"))
      // loud contract: the munch must consume the whole word (every char
      // is in the vocab, so a stall can only be an implementation bug)
      .withColumn("_ok", assert_true(col("_endpos") === length(col("_w")) + 1,
        lit("wordpiece munch stalled")))
      .filter(col("_ok").isNull)
      .drop("_ok", "_endpos")
    occ.join(ntok, "_w")
      .groupBy(slices: _*)
      .agg(sum(col("_c")).as("n_words"),
        sum(col("_c") * col("_ntok")).as("n_tokens"),
        sum(col("_c") * length(col("_w")).cast("long")).as("n_chars"))
      .select(slices ++ Seq(col("n_words"), col("n_tokens"), col("n_chars"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("tokens_per_word"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token")): _*)
  }
}
