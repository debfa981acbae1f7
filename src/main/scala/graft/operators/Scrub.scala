package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for LLM training-data pipelines: PII redaction,
  * intra-document repetition scoring, benchmark-contamination detection and
  * document-frequency boilerplate scrubbing.
  *
  * Scale shape: [[redactPii]] and [[duplicateTokenRatio]] are pure per-row
  * column arithmetic — zero shuffles, whole-stage codegen, they pipeline with
  * the parquet scan. [[contamination]] shuffles nothing on the (huge)
  * document side beyond one aggregation keyed by `idCol`; the benchmark
  * n-gram set is distinct-aggregated and broadcast. [[docFrequencyScrub]]
  * keeps all heavy stages keyed by document id; the token→document-frequency
  * table it joins against is vocabulary-sized (tiny relative to the corpus)
  * and broadcasts.
  *
  * Regex patterns stay inside the RE2-compatible subset (no lookaround, no
  * backreferences) so the same pattern strings run identically on engines
  * with RE2-style matchers.
  */
object Scrub {

  /** Email pattern: local part, @, dotted domain with a 2+-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4 pattern: four 1-3 digit octets (syntactic — no range check). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-ish phone pattern: +CC-NNN-NNNN with 1-3 digit country
    * code. Deliberately narrow — a broad phone regex eats numeric data; a
    * production pipeline tunes this per-corpus. */
  val PhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{4}"

  /** Redacts emails, IPv4 addresses and phone numbers with typed tags.
    * Application order matters and is fixed: emails first (their local parts
    * can contain digits a later pass would half-eat), then IPs (dotted digit
    * runs), then phones. Pure per-row regex work — no shuffle, codegen'd. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** The classic UTF-8-decoded-as-Latin-1 damage shapes: 'Ã' + the Latin-1
    * range UTF-8 continuation bytes actually map to (U+0080–U+00BF — so
    * é→Ã© flags while legitimate uppercase Portuguese like SÃO/JOÃO, where
    * Ã precedes a plain ASCII letter, passes) and 'â€' + anything (mangled
    * smart punctuation). Deliberately the two highest-precision patterns —
    * a broad mojibake net flags real Portuguese/French text. The `\x{..}`
    * class bounds parse identically in Java regex and RE2, so the q154
    * oracle replays the constant verbatim. */
  val MojibakeRe = "Ã[\\x{80}-\\x{BF}]|â€."
  /** U+FFFD — a decoder already gave up on these bytes. */
  val ReplacementRe = "�"
  /** C0 control characters except tab/newline/CR. */
  val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

  /** Per-slice encoding-damage audit (the ftfy-class hygiene check run
    * BEFORE any text analysis — mojibake inflates OOV rates, poisons
    * n-gram stats and survives most quality filters because the words
    * around it are fine): per group, how many documents carry replacement
    * characters (U+FFFD), Latin-1-mangled UTF-8 sequences, or stray C0
    * control bytes. Exact integer counts; `damage_rate` is the one
    * division. Detection is three shared regex constants so the q154
    * oracle replays the identical patterns.
    *
    * Scale shape: per-row regex flags (map-side) into one group-keyed
    * aggregation — [[piiIncidence]]'s shape. */
  def encodingDamage(df: DataFrame, groupCols: Seq[String],
                     textCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    val gcols = groupCols.map(col)
    def flag(re: String): Column =
      when(col(textCol).rlike(re), 1L).otherwise(0L)
    df.select(gcols :+ flag(ReplacementRe).as("_r") :+
        flag(MojibakeRe).as("_m") :+ flag(ControlRe).as("_c"): _*)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_r")).as("n_replacement"),
        sum(col("_m")).as("n_mojibake"),
        sum(col("_c")).as("n_control"),
        sum(when(col("_r") + col("_m") + col("_c") > 0L, 1L).otherwise(0L))
          .as("n_damaged"))
      .withColumn("damage_rate",
        col("n_damaged").cast("double") / col("n_docs").cast("double"))
  }

  /** Per-slice PII incidence with Wilson 95% score bounds — the
    * governance dashboard number behind [[redactPii]]: not just "how many
    * documents carry PII" but a defensible interval (Wilson, JASA 1927 —
    * the standard small-k binomial interval; a plain ±1.96√(pq/n) is
    * garbage at the low rates PII audits live at). Detection is the SAME
    * three patterns redaction uses, so the rate measures exactly what
    * redaction would touch.
    *
    * Determinism: counts are exact integers; the Wilson expressions are a
    * fixed-order chain of IEEE ops whose `z`/`z²` literals are planted
    * into both the plan and the q151 oracle; `sqrt` is correctly rounded
    * in both engines — no rounding anywhere.
    *
    * Scale shape: per-row regex flags (codegen'd, map-side) into one
    * group-keyed aggregation — the cheapest shape there is.
    *
    * Output per group: `(groupCols…, n_docs, n_email, n_ip, n_phone,
    * n_flagged, rate, wilson_lo, wilson_hi)`. */
  def piiIncidence(df: DataFrame, groupCols: Seq[String], textCol: String,
                   z: Double = 1.96): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    require(z > 0.0, s"z ($z) must be positive")
    val gcols = groupCols.map(col)
    def flag(re: String): Column =
      when(col(textCol).rlike(re), 1L).otherwise(0L)
    val agg = df
      .select(gcols :+ flag(EmailRe).as("_e") :+ flag(Ipv4Re).as("_i") :+
        flag(PhoneRe).as("_p"): _*)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_e")).as("n_email"),
        sum(col("_i")).as("n_ip"),
        sum(col("_p")).as("n_phone"),
        sum(when(col("_e") + col("_i") + col("_p") > 0L, 1L).otherwise(0L))
          .as("n_flagged"))
    val z2 = z * z
    val nD = col("n_docs").cast("double")
    val p = col("n_flagged").cast("double") / nD
    val denom = lit(1.0) + lit(z2) / nD
    val center = (p + lit(z2) / (lit(2.0) * nD)) / denom
    val half = (lit(z) / denom) *
      sqrt(p * (lit(1.0) - p) / nD + lit(z2) / (lit(4.0) * nD * nD))
    agg.select(gcols ++ Seq(col("n_docs"), col("n_email"), col("n_ip"),
      col("n_phone"), col("n_flagged"), p.as("rate"),
      greatest(lit(0.0), center - half).as("wilson_lo"),
      least(lit(1.0), center + half).as("wilson_hi")): _*)
  }

  /** The Wilson literals of [[piiIncidence]], exposed so the q151 oracle
    * text carries the SAME doubles the plan plants. */
  private[graft] def wilsonLiterals(z: Double): (Double, Double) = (z, z * z)

  /** Luhn checksum validity (ISO/IEC 7812-1 Annex B; Luhn 1960) of a
    * digit-only string column: from the RIGHT, double every second
    * digit, subtract 9 from doubles > 9, valid iff the sum ≡ 0 mod 10.
    * Expressed left-indexed — double where `(len + i)` is odd — so both
    * engines fold the identical integer terms in position order. */
  private[graft] def luhnValid(d: Column): Column =
    aggregate(transform(sequence(lit(1), length(d)), i => {
      val dig = d.substr(i, lit(1)).cast("long")
      when((length(d) + i) % 2 === 1,
        when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2))
        .otherwise(dig)
    }), lit(0L), (a, b) => a + b) % 10 === 0

  /** Payment-card (PAN) incidence per slice — the [[piiIncidence]]
    * family's high-precision lane: a regex alone flags every 13–19
    * digit run (mostly ids and phone numbers), so each candidate run
    * (digits, optionally space/dash separated: `[0-9][0-9 -]{11,21}
    * [0-9]`) is stripped to digits, length-checked to the PAN range
    * 13–19, and [[luhnValid]]-checksummed — the industry pre-filter
    * that kills ~90% of random digit runs. Reported per group:
    * candidate and Luhn-valid counts, documents carrying ≥1 valid PAN,
    * the document rate, and valid/candidate precision.
    *
    * Determinism: candidate extraction is one regex both engines run
    * identically (no backtracking subtleties: a character class with
    * bounded repetition, greedy, non-overlapping); the checksum is
    * pure integer arithmetic; the two rates divide exact longs. Null
    * group/text rows are excluded.
    *
    * Scale shape: ONE map-side-combined aggregation over one corpus
    * scan — per-row regex + a ≤19-term integer fold per candidate,
    * no shuffle beyond the group-sized collapse. */
  def luhnCardIncidence(df: DataFrame, groupCols: Seq[String],
                        textCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    val gcols = groupCols.map(col)
    val cands = regexp_extract_all(col(textCol),
      lit("[0-9][0-9 -]{11,21}[0-9]"), lit(0))
    val digits = transform(cands,
      c => regexp_replace(c, lit("[^0-9]"), lit("")))
    val valid = filter(digits,
      d => length(d).between(13, 19) && luhnValid(d))
    df.filter(gcols.map(_.isNotNull).reduce(_ && _) &&
        col(textCol).isNotNull)
      .select(gcols :+ size(cands).cast("long").as("_nc") :+
        size(valid).cast("long").as("_nv"): _*)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_nv") > 0L, 1L).otherwise(0L)).as("n_docs_with_pan"),
        sum(col("_nc")).as("n_candidates"),
        sum(col("_nv")).as("n_valid"))
      .withColumn("pan_doc_rate",
        col("n_docs_with_pan").cast("double") / col("n_docs").cast("double"))
      .withColumn("valid_rate",
        when(col("n_candidates") === 0L, lit(null).cast("double"))
          .otherwise(col("n_valid").cast("double") /
            col("n_candidates").cast("double")))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007): group rows into quasi-identifier equivalence classes
    * and report how much of the table is re-identifiable — rows in
    * classes smaller than `k` — and how much is attribute-disclosable —
    * rows in classes whose `sensitiveCol` shows fewer than `l`
    * distinct values. The release-gate read before publishing any
    * user-keyed slice of a 100 TB corpus.
    *
    * Exactness: class sizes and distinct counts are exact integers
    * (null sensitive values count as one value, the [[Audit
    * .fdViolations]] max-flag rule); the two shares are single double
    * divisions. Rows with a null in ANY quasi column form their own
    * legitimate classes (null is a visible value in a release). One
    * summary row: `(n_rows, n_classes, min_class_size,
    * n_rows_below_k, share_below_k, n_rows_low_diversity,
    * share_low_diversity)`.
    *
    * Scale shape: ONE map-side-combined aggregation to class
    * cardinality, ONE collapse to a single row. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, k: Long = 5L,
                 l: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2L, s"k ($k) must be >= 2")
    require(l >= 1L, s"l ($l) must be >= 1")
    val classes = df
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_sz"),
        (countDistinct(col(sensitiveCol)) +
          max(when(col(sensitiveCol).isNull, 1L).otherwise(0L)))
          .as("_div"))
    classes.agg(sum(col("_sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("_sz")).as("min_class_size"),
        sum(when(col("_sz") < k, col("_sz")).otherwise(0L))
          .as("n_rows_below_k"),
        sum(when(col("_div") < l, col("_sz")).otherwise(0L))
          .as("n_rows_low_diversity"))
      .select(col("n_rows"), col("n_classes"), col("min_class_size"),
        col("n_rows_below_k"),
        (col("n_rows_below_k").cast("double") /
          col("n_rows").cast("double")).as("share_below_k"),
        col("n_rows_low_diversity"),
        (col("n_rows_low_diversity").cast("double") /
          col("n_rows").cast("double")).as("share_low_diversity"))
  }

  /** Markup stripping for web-crawl text (the extraction-hygiene step a
    * CCNet/RefinedWeb-style pipeline runs before any quality analysis):
    * drops `<script>`/`<style>`/comment blocks WITH their payload, strips
    * remaining tags, decodes the common named entities, and collapses
    * whitespace. One pass, fixed order, all within the RE2-compatible
    * regex subset (inline `(?s)` + non-greedy `.*?`) so the exact chain
    * replays in any RE2 engine (q131's oracle).
    *
    * Order is load-bearing and deliberate:
    *  1. payload blocks first (a later tag strip would keep script BODIES);
    *  2. tag strip;
    *  3. entity decode AFTER tag strip — a decoded `&lt;b&gt;` yields
    *     literal `<b>` TEXT and must never be re-parsed as a tag (the
    *     classic double-decode injection); `&amp;` decodes last so
    *     `&amp;lt;` becomes the literal string `&lt;`, not `<`;
    *  4. whitespace collapse + trim.
    * Single-pass by design — NOT idempotent on adversarial input (that is
    * the point: one decode, ever). Numeric entities beyond `&#39;` are
    * left as-is (documented subset; a full decoder needs a codepoint map,
    * not a regex). Pure per-row regex work — zero shuffle, codegen'd. */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    val amp = regexp_replace(named, "&amp;", "&")
    trim(regexp_replace(amp, "\\s+", " "))
  }

  /** RFC-3986-shaped URL splitter: `scheme://authority path ?query
    * #fragment` as capture groups 1/2/3/4 — shared verbatim with the
    * q177 oracle so both engines run the SAME regex. */
  private[graft] val UrlSplitRe =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Tracking query parameters [[canonicalUrl]] drops (the CommonCrawl
    * dedup folklore set: UTM campaign tags + click ids + ref). */
  private[graft] val UrlTrackingRe = "^(utm_[a-zA-Z0-9_]*|gclid|fbclid|ref)="

  /** Canonical URL for crawl-scale dedup: the same page reached through
    * `HTTPS://WWW.Site.com:443//a//b/?utm_source=x&b=2&a=1#frag` and
    * `https://site.com/a/b?a=1&b=2` must hash identically, or URL-keyed
    * dedup silently keeps both copies. Rules, in order:
    *  1. drop the fragment;
    *  2. lowercase scheme and authority; strip a leading `www.`;
    *  3. strip the scheme's DEFAULT port only (`:80` http / `:443`
    *     https — other schemes keep theirs: `ftp://h:21` stays);
    *  4. collapse duplicate slashes in the path, strip one trailing
    *     slash, empty path → `/`;
    *  5. drop tracking params ([[UrlTrackingRe]]), sort the survivors
    *     bytewise, rejoin; an emptied query loses its `?`.
    * Non-URLs (no `scheme://`, or an empty host) canonicalize to NULL —
    * strict contract, callers quarantine. Documented NON-goals: userinfo,
    * percent-encoding normalization, IDN — those need a parser, not
    * expressions, and the rules above already merge the big equivalence
    * classes crawls actually contain.
    *
    * Pure per-row regex + array expressions — zero shuffle, codegen'd,
    * replayable in any RE2-class engine (the q177 oracle interpolates
    * the same two constants). */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlSplitRe, 1))
    val auth = lower(regexp_extract(url, UrlSplitRe, 2))
    val noWww = regexp_replace(auth, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val squashed = regexp_replace(regexp_extract(url, UrlSplitRe, 3), "/{2,}", "/")
    val path = when(squashed === "" || squashed === "/", lit("/"))
      .otherwise(regexp_replace(squashed, "/$", ""))
    val qbody = regexp_replace(regexp_extract(url, UrlSplitRe, 4), "^\\?", "")
    val params = array_sort(filter(split(qbody, "&"),
      x => x =!= "" && not(x.rlike(UrlTrackingRe))))
    val qpart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(url.isNotNull && url.rlike(UrlSplitRe) && host =!= "",
      concat(scheme, lit("://"), host, path, qpart))
  }

  /** Fraction of whitespace tokens that are repeats of an earlier token:
    * `1 - distinct/total`, in DOUBLE with a fixed op order (bit-identical on
    * any IEEE engine — no rounding). High values flag looping/boilerplate
    * generations worth dropping before training. */
  def duplicateTokenRatio(text: Column): Column = {
    val toks = split(text, " ")
    lit(1.0) - size(array_distinct(toks)).cast("double") /
      size(toks).cast("double")
  }

  /** Gopher-style stopwords: presence of ≥ [[GopherMinStopwords]] distinct
    * members is the "is this prose at all" gate (Rae et al. 2021 §A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Distinct-stopword threshold for [[gopherGates]]' `stopwords_ok`
    * (Rae et al. 2021 §A1.1 publishes 2). */
  val GopherMinStopwords: Int = 2

  /** Rule-based document quality gates (the Gopher/C4 heuristic family,
    * Rae et al. 2021 §A1.1 / Raffel et al. 2020 §2.2) as one per-row
    * struct of named booleans plus the conjunction:
    *
    *  - `words_ok`:         token count in `[minWords, maxWords]`
    *  - `mean_word_len_ok`: mean token length in [3, 10] chars
    *  - `symbol_ok`:        ≤ 10% of tokens contain `#` or `...`
    *  - `alpha_ok`:         ≥ 80% of tokens contain an alphabetic char
    *  - `stopwords_ok`:     ≥ [[GopherMinStopwords]] distinct [[GopherStopwords]] present
    *  - `pass`:             all of the above
    *
    * Unlike [[TextAnalysis.qualityScore]] (a blended score you threshold),
    * these are the published HARD gates — each failure names its reason,
    * which is what a filtering report at corpus scale needs. Pure per-row
    * array arithmetic over ONE let-bound tokenization (the
    * [[wordNgrams]] lesson): zero shuffle, fuses into the scan. All
    * ratios are exact integer-derived doubles with a fixed op order, so
    * every flag reproduces bit-identically in any engine (q87's oracle
    * replays the same arithmetic in DuckDB).
    *
    * `stopwords` defaults to the published English set; production
    * pipelines localize it per corpus/language (the gate is "contains ≥ 2
    * distinct members", whatever the members are). */
  def gopherGates(text: Column, minWords: Int = 50, maxWords: Int = 100000,
                  stopwords: Seq[String] = GopherStopwords): Column = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got [$minWords, $maxWords]")
    require(stopwords.size >= GopherMinStopwords,
      s"stopword gate needs at least $GopherMinStopwords candidate words")
    get(
      transform(array(split(trim(text), "\\s+")), tk => {
        val nTok = size(tk)
        val n = greatest(nTok.cast("double"), lit(1.0))
        val meanLen = aggregate(tk, lit(0L), (a, w) => a + length(w))
          .cast("double") / n
        val symbolic = size(filter(tk, w =>
          w.contains("#") || w.contains("..."))).cast("double") / n
        val alpha = size(filter(tk, w => w.rlike("[a-zA-Z]"))).cast("double") / n
        val stops = size(filter(
          array_distinct(transform(tk, w => lower(w))),
          w => w.isin(stopwords: _*)))
        val wordsOk = nTok >= minWords && nTok <= maxWords
        val meanOk = meanLen >= 3.0 && meanLen <= 10.0
        val symOk = symbolic <= 0.1
        val alphaOk = alpha >= 0.8
        val stopOk = stops >= GopherMinStopwords
        struct(
          wordsOk.as("words_ok"),
          meanOk.as("mean_word_len_ok"),
          symOk.as("symbol_ok"),
          alphaOk.as("alpha_ok"),
          stopOk.as("stopwords_ok"),
          (wordsOk && meanOk && symOk && alphaOk && stopOk).as("pass"))
      }),
      lit(0))
  }

  /** Gopher repetition thresholds (Rae et al. 2021 §A1.1 Table A1): a
    * document is dropped when any signal exceeds its published ceiling.
    * Keyed by output column name; the `pass` flag in [[repetitionSignals]]
    * is the conjunction of `signal <= ceiling` over this map. */
  val RepetitionThresholds: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20,
    "top2_char_frac" -> 0.20,
    "top3_char_frac" -> 0.18,
    "top4_char_frac" -> 0.16,
    "dup5_char_frac" -> 0.15,
    "dup6_char_frac" -> 0.14,
    "dup7_char_frac" -> 0.13,
    "dup8_char_frac" -> 0.12,
    "dup9_char_frac" -> 0.11,
    "dup10_char_frac" -> 0.10)

  /** Mass of characters inside duplicated runs of a sorted string array:
    * Σ over distinct values occurring c ≥ 2 times of `c · length(value)`.
    * One ascending sort + one linear fold — counts come from run lengths,
    * so no per-row map/groupBy structure is ever built. */
  private def dupRunMass(arr: Column): Column = {
    val closed = (a: Column) => a.getField("mass") +
      when(a.getField("run") >= 2,
        a.getField("run") * length(a.getField("prev")).cast("long"))
        .otherwise(lit(0L))
    aggregate(array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("mass")),
      (a, g) => when(g === a.getField("prev"),
          struct(a.getField("prev").as("prev"),
            (a.getField("run") + lit(1L)).as("run"),
            a.getField("mass").as("mass")))
        .otherwise(struct(g.as("prev"), lit(1L).as("run"),
          closed(a).as("mass"))),
      a => closed(a))
  }

  /** Character mass `c · length(g)` of the most frequent value in a string
    * array. Ties resolve by (count desc, length desc, value asc) — the asc
    * leg is free: the fold walks the sorted array and only a STRICT
    * improvement replaces the incumbent, so the lexicographically first
    * maximal run wins. (Full ties have equal `c·len`, so the fraction is
    * tie-rule-independent — the rule exists so both engines agree on which
    * gram "won", keeping the arithmetic auditable.) */
  private def topRunMass(arr: Column): Column = {
    def better(a: Column): Column =
      (a.getField("run") > a.getField("bc")) ||
        (a.getField("run") === a.getField("bc") &&
          length(a.getField("prev")).cast("long") > a.getField("bl"))
    def closeBc(a: Column) =
      when(better(a), a.getField("run")).otherwise(a.getField("bc"))
    def closeBl(a: Column) =
      when(better(a), length(a.getField("prev")).cast("long"))
        .otherwise(a.getField("bl"))
    aggregate(array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("bc"), lit(0L).as("bl")),
      (a, g) => when(g === a.getField("prev"),
          struct(a.getField("prev").as("prev"),
            (a.getField("run") + lit(1L)).as("run"),
            a.getField("bc").as("bc"), a.getField("bl").as("bl")))
        .otherwise(struct(g.as("prev"), lit(1L).as("run"),
          closeBc(a).as("bc"), closeBl(a).as("bl"))),
      a => closeBc(a) * closeBl(a))
  }

  /** Word n-grams over an ALREADY-BOUND token array (the [[wordNgrams]]
    * let-binding contract — callers pass a lambda-bound `tk`, never a raw
    * `split`, or every gram re-tokenizes the document). */
  private def gramsOf(tk: Column, n: Int): Column =
    when(size(tk) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(tk) - lit(n - 1)),
        i => array_join(slice(tk, i, lit(n)), " ")))

  /** Gopher repetition signals (Rae et al. 2021 §A1.1 Table A1) as one
    * per-row struct — the REPETITION half of the published filter battery
    * ([[gopherGates]] is the composition/length half):
    *
    *  - `n_lines`:             line count (split on `\n`)
    *  - `dup_line_frac`:       fraction of lines that repeat an earlier
    *                           line (`1 − distinct/total` over occurrences)
    *  - `dup_line_char_frac`:  fraction of line characters inside lines
    *                           whose content occurs ≥ 2 times (ALL
    *                           occurrences count, per the paper), over the
    *                           summed line char mass (separators excluded)
    *  - `top{2,3,4}_char_frac`: char mass `c·len` of the most frequent
    *                           word n-gram over `length(text)`
    *  - `dup{5..10}_char_frac`: Σ `c·len` over word n-grams with c ≥ 2,
    *                           over `length(text)`, clamped to 1.0
    *                           (overlapping occurrences can exceed the
    *                           document length; the clamp is the standard
    *                           implementation convention)
    *  - `pass`:                every signal ≤ its [[RepetitionThresholds]]
    *                           ceiling
    *
    * Every fraction is BIGINT-derived with a single DOUBLE division, so the
    * values (and therefore the threshold comparisons) reproduce
    * bit-identically on any IEEE engine — q128's oracle replays the same
    * counts relationally (group-by instead of run-folds; identical masses).
    *
    * Plan shape for 100 TB: pure per-row array arithmetic over one bound
    * tokenization — zero shuffle, fuses into the parquet scan. Per-doc cost
    * is nine `array_sort`+fold passes (3 top-n + 6 dup-n) over ≤ |tokens|
    * grams: O(L log L) per document, embarrassingly parallel. Tokenization
    * splits on `\s+` so line breaks never glue tokens together. */
  def repetitionSignals(text: Column): Column = {
    val chars = greatest(length(text).cast("long"), lit(1L))
    get(transform(array(split(trim(text), "\\s+")), tk =>
      get(transform(array(split(text, "\n")), ln => {
        val nLines = size(ln).cast("long")
        val dupLines = (size(ln) - size(array_distinct(ln))).cast("long")
        val lineMass = aggregate(ln, lit(0L), (a, l) => a + length(l).cast("long"))
        val dupLineFrac = dupLines.cast("double") / nLines.cast("double")
        val dupLineCharFrac = dupRunMass(ln).cast("double") /
          greatest(lineMass, lit(1L)).cast("double")
        def topFrac(n: Int): Column =
          topRunMass(gramsOf(tk, n)).cast("double") / chars.cast("double")
        def dupFrac(n: Int): Column =
          least(lit(1.0),
            dupRunMass(gramsOf(tk, n)).cast("double") / chars.cast("double"))
        val signals: Seq[(String, Column)] =
          Seq("dup_line_frac" -> dupLineFrac,
              "dup_line_char_frac" -> dupLineCharFrac) ++
            Seq(2, 3, 4).map(n => s"top${n}_char_frac" -> topFrac(n)) ++
            (5 to 10).map(n => s"dup${n}_char_frac" -> dupFrac(n))
        val limits = RepetitionThresholds.toMap
        // let-bind the signal struct before deriving `pass`: each signal is
        // a full gram-sort-fold pipeline, and referencing the raw columns
        // both as outputs AND inside the pass conjunction evaluated every
        // one of them twice (measured 13.1 -> 7.4 s at sf0.1)
        val sigStruct = struct(
          nLines.as("n_lines") +:
            signals.map { case (name, c) => c.as(name) }: _*)
        get(transform(array(sigStruct), st => {
          val pass = signals
            .map { case (name, _) => st.getField(name) <= lit(limits(name)) }
            .reduce(_ && _)
          struct(
            (st.getField("n_lines").as("n_lines") +:
              signals.map { case (name, _) => st.getField(name).as(name) }) :+
              pass.as("pass"): _*)
        }), lit(0))
      }), lit(0))), lit(0))
  }

  /** Word n-grams as space-joined strings; documents shorter than `n`
    * tokens yield an empty array (guarded — Spark's `sequence(1, 0)` counts
    * DOWN, it is not empty).
    *
    * The token array is let-bound through a single-element outer
    * `transform` (lambda variables are bound values): referencing the
    * `split` directly inside the per-gram lambda would re-tokenize the
    * whole document for EVERY gram — O(len²) per doc, measured 7× slower
    * at sf0.1. `element_at` reads off the bound array are O(1). */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n ($n) must be >= 1")
    get(
      transform(array(split(text, " ")), tk =>
        when(size(tk) < n, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(1), size(tk) - lit(n - 1)),
            i => concat_ws(" ",
              (0 until n).map(j => element_at(tk, i + lit(j))): _*)))),
      lit(0))
  }

  /** Benchmark-contamination report: for every document, how many of its
    * distinct word `n`-grams also occur in `benchmark` (the eval corpus),
    * plus a `contaminated` flag. The classic pre-training hygiene check —
    * train/test overlap detection by n-gram collision.
    *
    * Plan shape for 100 TB: the benchmark side is distinct-aggregated to a
    * bare n-gram set and broadcast (eval suites are small — MMLU-sized, not
    * corpus-sized); the document side computes per-row distinct grams with
    * array functions (no shuffle), explodes, hash-joins against the
    * broadcast set map-side, and aggregates hit counts keyed by `idCol` —
    * the only shuffle, and it carries only (id, 1) hit tuples. Documents
    * with zero hits are restored by a left join against the (id, n_grams)
    * base, which reuses the same hash partitioning. For a benchmark too big
    * to broadcast, pre-filter with a bloom filter and let the residual
    * shuffle join handle survivors — the shape here stays valid.
    */
  def contamination(docs: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    require(!docs.columns.contains("_grams") && !docs.columns.contains("_hits"),
      "input must not contain the reserved columns _grams/_hits")
    val benchGrams = benchmark
      .select(explode(wordNgrams(col(textCol), n)).as("_g"))
      .distinct()
    val base = docs.select(
      col(idCol),
      array_distinct(wordNgrams(col(textCol), n)).as("_grams"))
    val hits = base
      .select(col(idCol), explode(col("_grams")).as("_g"))
      .join(broadcast(benchGrams), "_g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
    base.select(col(idCol), size(col("_grams")).cast("long").as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Document-frequency boilerplate scrub: drops every token that occurs in
    * more than `maxDocPct` percent of documents (headers, footers, license
    * blurbs, navigation chrome — the corpus-wide noise that exact-dup
    * removal misses). Returns `(idCol, scrubbed, n_kept)` with the
    * surviving tokens in their original order; fully-scrubbed documents
    * yield an empty string, not a dropped row.
    *
    * The threshold compares `ndocs * 100 <= maxDocPct * total` in integer
    * arithmetic — exact on any engine, no float boundary.
    *
    * Plan shape for 100 TB: per-row distinct tokens (array op, no shuffle)
    * explode into (token, id) pairs whose aggregation produces a
    * VOCABULARY-sized DF table — the one cheap global exchange. The scrub
    * set joins back via broadcast (a vocabulary subset), so the token-level
    * filter is map-side; the only corpus-scale shuffle is the final
    * re-assembly keyed by `idCol`. Token order survives via posexplode +
    * sort_array over (pos, token) structs. */
  def docFrequencyScrub(docs: DataFrame, idCol: String, textCol: String,
                        maxDocPct: Int): DataFrame = {
    require(maxDocPct >= 0 && maxDocPct <= 100,
      s"maxDocPct ($maxDocPct) must be in [0, 100]")
    require(!docs.columns.exists(Set("_pos", "_tok", "_ndocs", "_total")),
      "input must not contain the reserved columns _pos/_tok/_ndocs/_total")
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("_toks"))
    val total = docs.agg(count(lit(1)).as("_total"))
    // vocabulary-sized: distinct tokens per doc -> docs-per-token
    val scrubSet = toks
      .select(col(idCol), explode(array_distinct(col("_toks"))).as("_tok"))
      .groupBy("_tok").agg(count(lit(1)).as("_ndocs"))
      .crossJoin(broadcast(total))
      .filter(col("_ndocs") * 100 > lit(maxDocPct) * col("_total"))
      .select("_tok")
    val kept = toks
      .select(col(idCol), posexplode(col("_toks")).as(Seq("_pos", "_tok")))
      .join(broadcast(scrubSet), Seq("_tok"), "left_anti")
      .groupBy(idCol)
      .agg(
        array_join(
          transform(
            sort_array(collect_list(struct(col("_pos"), col("_tok")))),
            s => s("_tok")),
          " ").as("scrubbed"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol))
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("scrubbed"), lit("")).as("scrubbed"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Line-level boilerplate removal, scoped per group (CCNet's line-dedup
    * step, Wenzek et al. 2020, applied by document-frequency like
    * [[docFrequencyScrub]]): inside each `groupCols` slice (a domain, a
    * crawl source), drop every LINE that appears in more than `maxDocPct`
    * percent of the slice's documents — cookie banners, nav chrome,
    * subscribe footers: the per-site noise token-level scrubbing can't see
    * because it lives in multiword lines. Returns `(idCol, scrubbed,
    * n_kept, n_dropped)` with surviving lines rejoined by `\n` in their
    * original order; a fully-scrubbed (or null-text) document yields an
    * empty string, not a dropped row. Threshold compares
    * `ndocs * 100 > maxDocPct * sliceDocs` in exact integer arithmetic.
    *
    * Plan shape for 100 TB: line explode is narrow; the distinct + count
    * aggregation is (slice, line)-keyed — the one corpus-scale exchange,
    * map-side combinable. The boilerplate set is structurally small: a
    * slice with d docs and L avg lines/doc has at most `L·100/maxDocPct`
    * qualifying lines REGARDLESS of d (each needs > maxDocPct% of docs),
    * so it broadcasts; the line filter is then map-side and the final
    * reassembly is the `idCol`-keyed aggregation every per-doc rebuild
    * pays. */
  def boilerplateLineScrub(docs: DataFrame, idCol: String, textCol: String,
                           groupCols: Seq[String], maxDocPct: Int): DataFrame = {
    require(maxDocPct >= 0 && maxDocPct <= 100,
      s"maxDocPct ($maxDocPct) must be in [0, 100]")
    require(groupCols.nonEmpty, "at least one group column is required")
    require(!docs.columns.exists(Set("_pos", "_line", "_ndocs", "_gdocs", "_ntot")),
      "input must not contain the reserved columns _pos/_line/_ndocs/_gdocs/_ntot")
    val grp = groupCols.map(col)
    val lines = docs.select(
      grp :+ col(idCol) :+ posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")): _*)
    val sliceTotals = docs.groupBy(grp: _*).agg(count(lit(1)).as("_gdocs"))
    val scrubSet = lines
      .select(grp :+ col(idCol) :+ col("_line"): _*).distinct()
      .groupBy(grp :+ col("_line"): _*).agg(count(lit(1)).as("_ndocs"))
      .join(broadcast(sliceTotals), groupCols)
      .filter(col("_ndocs") * 100 > lit(maxDocPct) * col("_gdocs"))
      .select(grp :+ col("_line"): _*)
    val kept = lines
      .join(broadcast(scrubSet), groupCols :+ "_line", "left_anti")
      .groupBy(idCol)
      .agg(
        array_join(
          transform(
            sort_array(collect_list(struct(col("_pos"), col("_line")))),
            s => s("_line")),
          "\n").as("scrubbed"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol),
        coalesce(size(split(col(textCol), "\n")), lit(0)).cast("long").as("_ntot"))
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("scrubbed"), lit("")).as("scrubbed"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("_ntot") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

}
