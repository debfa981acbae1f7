package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016, ACL — the
  * subword vocabulary algorithm behind GPT/Llama-style tokenizers), shaped
  * for a corpus that does not fit anywhere:
  *
  *  - ONE corpus-scale pass: the whitespace word-frequency aggregation
  *    (map-side combinable, the q42-family shape).
  *  - Every Lloyd-style merge iteration then runs on the DISTINCT-WORD
  *    table only (vocabulary-sized — 10⁵..10⁷ rows at 100 TB, independent
  *    of corpus size): adjacent-pair counts weighted by word frequency,
  *    one argmax, one per-row fold applying the merge. This is the
  *    textbook scalable BPE — iterating over the corpus instead would be
  *    `merges` full scans.
  *  - The per-iteration argmax collects ONE row (the
  *    [[IvfIndex.centroids]] driver-work contract: bounded by the merge
  *    count, never data-sized); `localCheckpoint` truncates the lineage so
  *    iteration i does not replay iterations 1..i−1.
  *
  * Determinism: pair weights are exact integers; the winning pair is
  * argmax by `(weight DESC, left ASC, right ASC)` — total order, so every
  * engine (and q133's unrolled-CTE oracle) picks the same merge sequence.
  * Merge application is the greedy left-to-right scan of the reference
  * implementation, expressed as a fixed-order fold: `(out, pend)`
  * accumulator, a pending symbol merges with the current one iff they are
  * exactly (left, right) — overlapping runs resolve left-first ("aaa"
  * under (a,a) → ["aa", "a"]), matching the published algorithm.
  *
  * No end-of-word marker is appended (the within-word merge structure is
  * identical; add one by mapping `word → word || '\\u0000w'` upstream if
  * cross-word boundary symbols are needed). */
object Bpe {

  /** Single-character symbol array of a word (bound split; the empty
    * strings Java's `split("")` emits under limit −1 are filtered). */
  private[operators] def charSymbols(word: Column): Column =
    filter(split(word, ""), c => c =!= "")

  /** One greedy left-to-right merge pass: every non-overlapping
    * occurrence of `(left, right)` in `syms` becomes the concatenated
    * symbol. Pure fold — vocabulary-sized work, no shuffle. */
  private[operators] def applyMerge(syms: Column, left: String,
                                    right: String): Column = {
    val merged = left + right
    val flush = (a: Column) =>
      when(a.getField("pend") === "", a.getField("out"))
        .otherwise(concat(a.getField("out"), array(a.getField("pend"))))
    aggregate(syms,
      struct(array().cast("array<string>").as("out"), lit("").as("pend")),
      (a, x) => when(a.getField("pend") === lit(left) && x === lit(right),
          struct(concat(a.getField("out"), array(lit(merged))).as("out"),
            lit("").as("pend")))
        .otherwise(struct(flush(a).as("out"), x.as("pend"))),
      a => flush(a))
  }

  /** Word-frequency table of a corpus: `(word, weight)` — THE one
    * corpus-scale aggregation; everything else runs on its output. */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("weight"))

  /** Train `merges` BPE merge rules over a word-frequency table
    * (`wordCol`, integer `weightCol`). Returns one row per learned rule:
    * `(step 1-based, left, right, merged, weight)` where `weight` is the
    * frequency-weighted count of adjacent `(left, right)` occurrences at
    * the time of the merge. Stops early (fewer rows) when no adjacent
    * pair remains. */
  def trainMerges(words: DataFrame, wordCol: String, weightCol: String,
                  merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 65536,
      s"merges ($merges) must be in [1, 65536]")
    val spark = words.sparkSession
    import spark.implicits._
    var syms = words
      .select(charSymbols(col(wordCol)).as("syms"),
        col(weightCol).cast("long").as("weight"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      // adjacent pairs weighted by word frequency; one vocab-sized
      // aggregation, then a single-row argmax with the fixed tie order
      val top = syms
        .select(col("weight"), col("syms"), posexplode(slice(col("syms"), lit(1),
          greatest(size(col("syms")) - 1, lit(0)))).as(Seq("pos", "l")))
        .withColumn("r", element_at(col("syms"), col("pos") + 2))
        .groupBy("l", "r").agg(sum("weight").as("w"))
        .orderBy(col("w").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val l = row.getString(0)
        val r = row.getString(1)
        val w = row.getLong(2)
        step += 1
        learned += ((step, l, r, l + r, w))
        syms = syms
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    learned.toSeq.toDF("step", "left", "right", "merged", "weight")
  }

  /** One greedy left-to-right pass applying a BATCH of symbol-disjoint
    * merge rules in a single fold: at most one rule can match any
    * (pend, current) slot (disjointness), so one pass is exactly the
    * composition of the per-rule passes in any order — one Spark job per
    * ROUND instead of one per merge. */
  private[operators] def applyMergeBatch(syms: Column,
                                         rules: Seq[(String, String)]): Column = {
    require(rules.nonEmpty, "applyMergeBatch needs at least one rule")
    val flush = (a: Column) =>
      when(a.getField("pend") === "", a.getField("out"))
        .otherwise(concat(a.getField("out"), array(a.getField("pend"))))
    aggregate(syms,
      struct(array().cast("array<string>").as("out"), lit("").as("pend")),
      (a, x) => {
        val hit = rules.tail.foldLeft(
          when(a.getField("pend") === lit(rules.head._1) &&
            x === lit(rules.head._2), lit(rules.head._1 + rules.head._2))) {
          case (acc, (l, r)) =>
            acc.when(a.getField("pend") === lit(l) && x === lit(r), lit(l + r))
        }
        when(hit.isNotNull,
          struct(concat(a.getField("out"), array(hit)).as("out"),
            lit("").as("pend")))
          .otherwise(struct(flush(a).as("out"), x.as("pend")))
      },
      a => flush(a))
  }

  /** Train `merges` BPE rules with PROVABLY-SEQUENTIAL batching: produces
    * the IDENTICAL rule sequence as [[trainMerges]] (same argmax order,
    * same weights) in ~batch-size× fewer driver rounds — the fix for the
    * one-driver-round-per-merge cost that makes a 32k-merge production
    * vocabulary 32k Spark jobs.
    *
    * Naive "apply all symbol-disjoint top pairs" batching is NOT
    * equivalent to sequential BPE: merging the top pair can create a new
    * pair (e.g. `aaa` under `(a,a)` creates `(aa,a)`) whose count beats
    * the next disjoint candidate, so sequential would pick the new pair
    * first. This trainer therefore accepts a strict RANK-PREFIX of the
    * round's candidates, extending the batch only while provably safe:
    *
    *  1. candidates are the round's top `maxBatch` pairs in the exact
    *     sequential order (weight DESC, left, right) — a prefix, never a
    *     skip (a skipped pair could still be the true next argmax);
    *  2. each accepted pair must be symbol-disjoint from all earlier
    *     accepted ones (so its count is untouched by them — a merge
    *     consumes only its own symbols and creates only its merged
    *     symbol, and adjacencies elsewhere are unaffected);
    *  3. its weight must STRICTLY exceed the maximum weight any earlier
    *     accepted merge could hand a NEW pair — bounded by the
    *     adjacent-TRIPLE counts: every occurrence of a new pair
    *     `(x, lr)` / `(lr, y)` comes from a triple `(x,l,r)` / `(l,r,y)`,
    *     so `max(w3)` over the triples containing the accepted pair is an
    *     upper bound (strict >, because an equal-weight new pair could
    *     win on the (left, right) tie order);
    *  4. the batch STOPS after any accepted pair whose merged symbol
    *     already exists in the vocabulary (its merge would INCREASE old
    *     pairs involving that symbol, invalidating later comparisons).
    *
    * Under 1–4, at every virtual sub-step the accepted pair is the exact
    * argmax sequential BPE would pick: higher-ranked old pairs are all
    * already merged (prefix), surviving old pairs can only have lost
    * weight, and new pairs sit strictly below the cap. Verified by the
    * BpeSpec property test (batched ≡ sequential, including the
    * `aaa`-style adversarial corpus) and by q155 against the same
    * unrolled sequential oracle as q133.
    *
    * Per-round cost: one exploded projection feeding the pair and triple
    * aggregations (vocabulary-sized), two bounded collects (top
    * `maxBatch` pairs, ≤ 2·maxBatch triple caps), one bounded existence
    * probe, one batched merge fold + checkpoint. */
  def trainMergesBatched(words: DataFrame, wordCol: String, weightCol: String,
                         merges: Int, maxBatch: Int = 32): DataFrame = {
    require(merges >= 1 && merges <= 65536,
      s"merges ($merges) must be in [1, 65536]")
    require(maxBatch >= 1 && maxBatch <= 256,
      s"maxBatch ($maxBatch) must be in [1, 256]")
    val spark = words.sparkSession
    import spark.implicits._
    var syms = words
      .select(charSymbols(col(wordCol)).as("syms"),
        col(weightCol).cast("long").as("weight"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      val expl = syms
        .select(col("weight"), col("syms"),
          posexplode(slice(col("syms"), lit(1),
            greatest(size(col("syms")) - 1, lit(0)))).as(Seq("pos", "l")))
        .withColumn("r", element_at(col("syms"), col("pos") + 2))
      val pairs = expl.groupBy("l", "r").agg(sum("weight").as("w"))
      val want = math.min(maxBatch, merges - step)
      val cands = pairs.orderBy(col("w").desc, col("l"), col("r"))
        .limit(want).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cands.isEmpty) exhausted = true
      else {
        // driver-side disjoint prefix first — it's free, and when it stops
        // at one rule (common on natural text, where top pairs share
        // letters) the round degrades to EXACTLY the sequential cost: no
        // cap job, no existence job
        val disjointPrefix = {
          val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
          var used = Set.empty[String]
          var open = true
          for ((l, r, w) <- cands if open) {
            val m = l + r
            if (buf.nonEmpty && (used(l) || used(r) || used(m))) open = false
            else { buf += ((l, r, w)); used = used + l + r + m }
          }
          buf.toSeq
        }
        val batch =
          if (disjointPrefix.size <= 1) disjointPrefix
          else {
            // triple caps for the prefix candidates: max adjacent-triple
            // weight containing the pair at either position — the upper
            // bound on any new pair its merge can create. Both cap
            // aggregations and the merged-symbol existence probe union
            // into ONE bounded-collect job. The bounds-guarded z keeps
            // element_at in range under ANSI mode.
            val dp = disjointPrefix
            val t3 = expl
              .withColumn("z", when(size(col("syms")) >= col("pos") + 3,
                element_at(col("syms"), col("pos") + 3)))
              .filter(col("z").isNotNull)
              .groupBy("l", "r", "z").agg(sum("weight").as("w3"))
            def isCand(a: Column, b: Column) = dp.map { case (l, r, _) =>
              a === lit(l) && b === lit(r)
            }.reduce(_ || _)
            val mergedCands = dp.map { case (l, r, _) => l + r }.distinct
            val probe = t3.filter(isCand(col("l"), col("r")))
              .groupBy("l", "r").agg(max("w3").as("c"))
              .select(lit("first").as("k"), col("l"), col("r"), col("c"))
              .unionByName(t3.filter(isCand(col("r"), col("z")))
                .groupBy("r", "z").agg(max("w3").as("c"))
                .select(lit("last").as("k"), col("r").as("l"),
                  col("z").as("r"), col("c")))
              // which candidate MERGED symbols already exist adjacent to
              // anything? an isolated single-symbol word can't feed a
              // pair, so the pair table's symbol set is the universe
              .unionByName(pairs
                .select(explode(array(col("l"), col("r"))).as("s"))
                .filter(col("s").isin(mergedCands: _*)).distinct()
                .select(lit("exists").as("k"), col("s").as("l"),
                  lit("").as("r"), lit(0L).as("c")))
              .collect()
            val capFirst = probe.filter(_.getString(0) == "first")
              .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
            val capLast = probe.filter(_.getString(0) == "last")
              .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
            val existing = probe.filter(_.getString(0) == "exists")
              .map(_.getString(1)).toSet
            val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
            var cap = Long.MinValue
            var open = true
            for ((l, r, w) <- dp if open) {
              if (buf.nonEmpty && w <= cap) open = false
              else {
                buf += ((l, r, w))
                cap = math.max(cap,
                  math.max(capFirst.getOrElse((l, r), Long.MinValue),
                    capLast.getOrElse((l, r), Long.MinValue)))
                // merged symbol collides with an existing one: its merge
                // can INCREASE old pairs — nothing after it is provably
                // the argmax
                if (existing(l + r)) open = false
              }
            }
            buf.toSeq
          }
        batch.foreach { case (l, r, w) =>
          step += 1
          learned += ((step, l, r, l + r, w))
        }
        syms = syms
          .withColumn("syms",
            applyMergeBatch(col("syms"), batch.map(t => (t._1, t._2))))
          .localCheckpoint(true)
      }
    }
    learned.toSeq.toDF("step", "left", "right", "merged", "weight")
  }

  /** End-to-end batched: corpus → word frequencies → `merges` rules;
    * identical output to [[train]] in ~batch× fewer driver rounds. */
  def trainBatched(df: DataFrame, textCol: String, merges: Int,
                   maxBatch: Int = 32): DataFrame =
    trainMergesBatched(wordFrequencies(df, textCol), "word", "weight",
      merges, maxBatch)

  /** End-to-end: corpus → word frequencies → `merges` rules. */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame =
    trainMerges(wordFrequencies(df, textCol), "word", "weight", merges)

  /** Tokenize `word` with an ORDERED merge-rule list (the trainer's
    * output order IS the application order, per the published algorithm:
    * rule 1 first, each rule a full greedy pass). Driver-side rule list —
    * merge tables are small (30k-100k rules in practice) and the rules
    * fold into the plan as literals, so tokenization itself is a pure
    * per-row map: zero shuffle, corpus-scale parallel. */
  def encode(word: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(charSymbols(word)) { case (s, (l, r)) => applyMerge(s, l, r) }

  /** Tokenizer-fertility report per slice: encode the corpus with an
    * ORDERED rule list and report, per slice, `tokens_per_word` (fertility
    * — the standard multilingual tokenizer-equity metric: a slice the
    * tokenizer serves badly fragments into more pieces per word) and
    * `chars_per_token` (compression). All counts are exact integers; each
    * ratio is ONE double division, so results are bit-reproducible.
    *
    * Scale shape: one corpus tokenize pass collapses occurrences to
    * `(slice, word)` counts (vocabulary×slices sized); the expensive
    * rule-fold ENCODE runs once per DISTINCT word (vocabulary sized, not
    * corpus sized) and joins back by word — at 100 TB the encode cost is
    * the vocabulary's, and the rule list rides the plan as literals
    * (zero shuffle beyond the two vocab-sized aggregations). */
  def fertility(df: DataFrame, textCol: String, sliceCols: Seq[String],
                rules: Seq[(String, String)]): DataFrame = {
    require(sliceCols.nonEmpty, "sliceCols must name at least one column")
    val reserved = Seq("_w", "_c", "_ntok", "_nchr")
    require(!sliceCols.exists(reserved.contains) && !reserved.contains(textCol),
      s"reserved columns ${reserved.mkString(", ")} must not appear in inputs")
    val slices = sliceCols.map(col)
    val occ = df.select(slices :+ explode(split(trim(col(textCol)), "\\s+")).as("_w"): _*)
      .filter(col("_w") =!= "")
      .groupBy(col("_w") +: slices: _*).agg(count(lit(1)).as("_c"))
    val vocab = occ.select(col("_w")).distinct()
      .select(col("_w"), size(encode(col("_w"), rules)).as("_ntok"),
        length(col("_w")).as("_nchr"))
    occ.join(vocab, "_w")
      .groupBy(slices: _*)
      .agg(sum(col("_c")).as("n_words"),
        sum(col("_c") * col("_ntok")).as("n_tokens"),
        sum(col("_c") * col("_nchr").cast("long")).as("n_chars"))
      .select(slices ++ Seq(col("n_words"), col("n_tokens"), col("n_chars"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("tokens_per_word"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token")): _*)
  }
}
