package graft.operators

import graft.SparkFunSuite

class ScrubSpec extends SparkFunSuite {
  import spark.implicits._

  test("redactPii replaces emails, IPs and phones with typed tags") {
    val df = Seq(
      "mail bob.smith+x@ex-ample.org now",
      "from 10.0.255.1 port 80",
      "call +1-555-0142 today",
      "all three a@b.io 192.168.0.1 +44-201-9999",
      "clean text stays clean"
    ).toDF("t").select(Scrub.redactPii($"t").as("r"))
    val r = df.as[String].collect()
    assert(r(0) == "mail <EMAIL> now")
    assert(r(1) == "from <IP> port 80")
    assert(r(2) == "call <PHONE> today")
    assert(r(3) == "all three <EMAIL> <IP> <PHONE>")
    assert(r(4) == "clean text stays clean")
  }

  test("redaction order: an email's digit-bearing local part never half-redacts") {
    val r = Seq("x 12.34.56.78@host.com y").toDF("t")
      .select(Scrub.redactPii($"t")).as[String].head()
    assert(r == "x <EMAIL> y")
  }

  test("duplicateTokenRatio: 0 for all-distinct, exact fraction for repeats") {
    val out = Seq("a b c d", "a a a a", "a b a b")
      .toDF("t").select(Scrub.duplicateTokenRatio($"t")).as[Double].collect()
    assert(out(0) == 0.0)
    assert(out(1) == 0.75)
    assert(out(2) == 0.5)
  }

  test("wordNgrams emits sliding grams and an empty array for short docs") {
    val g3 = Seq("a b c d").toDF("t")
      .select(Scrub.wordNgrams($"t", 3)).as[Seq[String]].head()
    assert(g3 == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Scrub.wordNgrams($"t", 3)).as[Seq[String]].head()
    assert(short == Seq.empty)
  }

  test("contamination counts distinct-gram hits and flags zero-hit docs false") {
    val bench = Seq((100L, "w x y z")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b w x y c"),   // grams {a b w, b w x, w x y, x y c}: 1 hit
      (2L, "p q r s"),       // no overlap
      (3L, "w x y z w x y")  // {w x y, x y z, y z w, z w x, x y w}... distinct hits: "w x y","x y z"
    ).toDF("doc_id", "text")
    val out = Scrub.contamination(docs, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_hits") == 1L && out(0).getAs[Boolean]("contaminated"))
    assert(out(1).getAs[Long]("n_hits") == 0L && !out(1).getAs[Boolean]("contaminated"))
    assert(out(2).getAs[Long]("n_hits") == 2L)
    assert(out(0).getAs[Long]("n_grams") == 4L)
  }

  test("docFrequencyScrub drops high-DF tokens, keeps order, keeps empty docs") {
    // "x" in 3/3 docs (100%), "y" in 2/3 (67%), others in 1/3
    val docs = Seq(
      (1L, "x y a x"),
      (2L, "y x b"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val out = Scrub.docFrequencyScrub(docs, "doc_id", "text", maxDocPct = 70)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("scrubbed") == "y a" && out(0).getAs[Long]("n_kept") == 2L)
    assert(out(1).getAs[String]("scrubbed") == "y b")
    assert(out(2).getAs[String]("scrubbed") == "" && out(2).getAs[Long]("n_kept") == 0L)
  }

  test("docFrequencyScrub threshold boundary is integer-exact") {
    // token in exactly 1 of 2 docs = 50%: kept at pct=50, dropped at pct=49
    val docs = Seq((1L, "u v"), (2L, "v w")).toDF("doc_id", "text")
    val at50 = Scrub.docFrequencyScrub(docs, "doc_id", "text", 50)
      .orderBy("doc_id").collect()
    assert(at50(0).getAs[String]("scrubbed") == "u" && at50(1).getAs[String]("scrubbed") == "w")
    val at100 = Scrub.docFrequencyScrub(docs, "doc_id", "text", 100)
      .orderBy("doc_id").collect()
    assert(at100(0).getAs[String]("scrubbed") == "u v")
  }

  test("reserved working columns are rejected") {
    val docs = Seq((1L, "a", 0)).toDF("doc_id", "text", "_grams")
    intercept[IllegalArgumentException] {
      Scrub.contamination(docs, docs, "doc_id", "text")
    }
    val docs2 = Seq((1L, "a", 0)).toDF("doc_id", "text", "_tok")
    intercept[IllegalArgumentException] {
      Scrub.docFrequencyScrub(docs2, "doc_id", "text", 50)
    }
    val docs3 = Seq((1L, "a", "s", 0)).toDF("doc_id", "text", "src", "_line")
    intercept[IllegalArgumentException] {
      Scrub.boilerplateLineScrub(docs3, "doc_id", "text", Seq("src"), 50)
    }
  }

  test("boilerplateLineScrub drops per-slice boilerplate lines, keeps order and rare lines") {
    // src A: header in 3/3 docs (100%), footer in 2/3 (67%), bodies unique.
    // src B: the SAME header text appears in only 1/2 docs (50%) -> kept
    // there: the scrub is slice-scoped, never global.
    val docs = Seq(
      (1L, "A", "promo header\nbody one\nfooter"),
      (2L, "A", "promo header\nbody two\nfooter"),
      (3L, "A", "promo header\nbody three"),
      (4L, "B", "promo header\nbody four"),
      (5L, "B", "body five")
    ).toDF("doc_id", "src", "text")
    val out = Scrub.boilerplateLineScrub(docs, "doc_id", "text", Seq("src"), maxDocPct = 70)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("scrubbed") == "body one\nfooter"
      && out(0).getAs[Long]("n_kept") == 2L && out(0).getAs[Long]("n_dropped") == 1L)
    assert(out(1).getAs[String]("scrubbed") == "body two\nfooter")
    assert(out(2).getAs[String]("scrubbed") == "body three")
    assert(out(3).getAs[String]("scrubbed") == "promo header\nbody four",
      "slice B's 50% header must survive a 70% threshold")
    assert(out(4).getAs[String]("scrubbed") == "body five")
  }

  test("boilerplateLineScrub: fully-scrubbed and null-text docs yield empty rows, counts exact") {
    val docs = Seq(
      (1L, "A", "only line"),
      (2L, "A", "only line"),
      (3L, "A", null: String)
    ).toDF("doc_id", "src", "text")
    val out = Scrub.boilerplateLineScrub(docs, "doc_id", "text", Seq("src"), maxDocPct = 50)
      .orderBy("doc_id").collect()
    // "only line" is in 2/3 docs (67% > 50) -> dropped everywhere
    assert(out(0).getAs[String]("scrubbed") == ""
      && out(0).getAs[Long]("n_kept") == 0L && out(0).getAs[Long]("n_dropped") == 1L)
    assert(out(2).getAs[String]("scrubbed") == ""
      && out(2).getAs[Long]("n_kept") == 0L && out(2).getAs[Long]("n_dropped") == 0L)
  }

  test("boilerplateLineScrub plan: the scrub set broadcasts into the anti-join") {
    // the 100 TB contract: the boilerplate set is structurally bounded
    // (≤ L·100/pct lines per slice regardless of doc count), so the line
    // filter must be a broadcast anti-join — a shuffled anti-join here
    // would exchange the exploded corpus against a tiny table. Inspected
    // after execution (AQE-final), the IvfIndexSpec convention.
    val docs = (1L to 300L).map(i => (i, s"s${i % 3}", s"header\nbody $i"))
      .toDF("doc_id", "src", "text")
    val df = Scrub.boilerplateLineScrub(docs, "doc_id", "text", Seq("src"), 60)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val antiLines = plan.split("\n").filter(_.contains("LeftAnti"))
    assert(antiLines.nonEmpty, s"line filter must be an anti-join:\n$plan")
    assert(antiLines.forall(_.contains("Broadcast")),
      s"the bounded scrub set must broadcast, never shuffle the line stream:\n$plan")
  }

  test("boilerplateLineScrub threshold boundary is integer-exact") {
    // line in exactly 1 of 2 docs = 50%: kept at pct=50, dropped at pct=49
    val docs = Seq((1L, "A", "u\nshared"), (2L, "A", "shared\nw"))
      .toDF("doc_id", "src", "text")
    val at50 = Scrub.boilerplateLineScrub(docs, "doc_id", "text", Seq("src"), 50)
      .orderBy("doc_id").collect()
    assert(at50(0).getAs[String]("scrubbed") == "u"
      && at50(1).getAs[String]("scrubbed") == "w",
      "a 50% line must survive pct=50; the 100% line must not")
    val at100 = Scrub.boilerplateLineScrub(docs, "doc_id", "text", Seq("src"), 100)
      .orderBy("doc_id").collect()
    assert(at100(0).getAs[String]("scrubbed") == "u\nshared")
    val at49 = Scrub.boilerplateLineScrub(docs, "doc_id", "text", Seq("src"), 49)
      .orderBy("doc_id").collect()
    assert(at49(0).getAs[String]("scrubbed") == ""
      && at49(1).getAs[String]("scrubbed") == "",
      "at pct=49 the 50% lines drop too")
  }

  test("gopherGates: each gate fails for exactly its planted defect") {
    import org.apache.spark.sql.functions.col
    val prose = "the quick brown fox jumps over and over with great energy " +
      "to be sure that every reader will have seen plenty of ordinary words here"
    val fixtures = Seq(
      (1L, prose),                                        // everything ok
      (2L, "too short to pass the word gate"),            // words_ok fails
      (3L, prose + " " + Seq.fill(4)("### ### ###").mkString(" ")), // symbol_ok fails
      (4L, prose + " " + (1 to 20).map(_.toString).mkString(" ")),  // alpha_ok fails
      (5L, Seq.fill(25)("lorem ipsum dolor amet").mkString(" ")),   // stopwords_ok fails
      (6L, Seq.fill(30)("a b").mkString(" "))             // mean_word_len_ok fails (mean 1)
    ).toDF("id", "text")
    val g = fixtures
      .select(col("id"), Scrub.gopherGates(col("text"), minWords = 20).as("g"))
      .orderBy("id").collect()
    def gate(i: Int, name: String): Boolean =
      g(i).getStruct(1).getAs[Boolean](name)
    assert(gate(0, "pass"), "clean prose must pass every gate")
    assert(!gate(1, "words_ok") && gate(1, "stopwords_ok"))
    assert(!gate(2, "symbol_ok") && gate(2, "words_ok"))
    assert(!gate(3, "alpha_ok") && gate(3, "words_ok"))
    assert(!gate(4, "stopwords_ok") && gate(4, "alpha_ok"))
    assert(!gate(5, "mean_word_len_ok") && gate(5, "words_ok"))
    for (i <- 1 to 5) assert(!g(i).getStruct(1).getAs[Boolean]("pass"))
  }

  test("gopherGates: empty and whitespace-only text fail closed, never throw") {
    import org.apache.spark.sql.functions.col
    val g = Seq((1L, ""), (2L, "   "), (3L, "\t\n"))
      .toDF("id", "text")
      .select(Scrub.gopherGates(col("text")).as("g"))
      .collect()
    g.foreach(r => assert(!r.getStruct(0).getAs[Boolean]("pass")))
  }

  // ---- stripMarkup ----

  test("stripMarkup: tags strip, script/style/comment payloads drop entirely") {
    import org.apache.spark.sql.functions.col
    val html = "<html><head><style>p{color:red}</style></head>" +
      "<body class=\"x\"><p>hello <b>world</b></p>" +
      "<script type=\"text/js\">var a=1;\nalert(a)</script><!-- note -->bye</body></html>"
    val r = Seq(html).toDF("t").select(Scrub.stripMarkup(col("t"))).as[String].head()
    assert(r == "hello world bye")
  }

  test("stripMarkup: entities decode once, after tag strip — no double decode") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "a &amp;lt; b" -> "a &lt; b",          // &amp; decodes LAST: literal &lt; text
      "x &lt;b&gt; y" -> "x <b> y",          // decoded brackets stay literal text
      "&quot;q&quot; &#39;s&#39;&nbsp;end" -> "\"q\" 's' end",
      "5 &gt; 3 &amp; 2 &lt; 4" -> "5 > 3 & 2 < 4")
    val got = cases.map(_._1).toDF("t")
      .select(Scrub.stripMarkup(col("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("stripMarkup: whitespace collapses and trims; markup-free text is stable") {
    import org.apache.spark.sql.functions.col
    val got = Seq("  a\n\nb\t c  ", "plain text stays", "<p></p>")
      .toDF("t").select(Scrub.stripMarkup(col("t"))).as[String].collect().toSeq
    assert(got == Seq("a b c", "plain text stays", ""))
  }

  // ---- repetitionSignals (Gopher repetition battery) ----

  /** Plain-Scala reference implementation with the SAME op order (BIGINT
    * masses, one double division), so equality below is exact. */
  private def naiveRepetition(text: String): (Long, Seq[Double], Boolean) = {
    val chars = math.max(text.length, 1).toLong
    val tk = text.trim.split("\\s+", -1).toSeq
    val ln = text.split("\n", -1).toSeq
    def counts(xs: Seq[String]): Map[String, Long] =
      xs.groupBy(identity).map { case (g, o) => (g, o.size.toLong) }
    def grams(n: Int): Seq[String] =
      if (tk.size < n) Seq.empty else tk.sliding(n).map(_.mkString(" ")).toSeq
    def topMass(gs: Seq[String]): Long = {
      val c = counts(gs)
      if (c.isEmpty) 0L
      else {
        val (g, n) = c.toSeq.minBy { case (g, n) => (-n, -g.length.toLong, g) }
        n * g.length
      }
    }
    def dupMass(c: Map[String, Long]): Long =
      c.collect { case (g, n) if n >= 2 => n * g.length }.sum
    val lnCounts = counts(ln)
    val nLines = ln.size.toLong
    val lineMass = ln.map(_.length.toLong).sum
    val sig: Seq[Double] =
      Seq((nLines - ln.distinct.size).toDouble / nLines.toDouble,
        dupMass(lnCounts).toDouble / math.max(lineMass, 1L).toDouble) ++
        Seq(2, 3, 4).map(n => topMass(grams(n)).toDouble / chars.toDouble) ++
        (5 to 10).map(n =>
          math.min(1.0, dupMass(counts(grams(n))).toDouble / chars.toDouble))
    val pass = sig.zip(Scrub.RepetitionThresholds.map(_._2))
      .forall { case (v, th) => v <= th }
    (nLines, sig, pass)
  }

  private val sigNames = Scrub.RepetitionThresholds.map(_._1)

  private def runSignals(texts: Seq[String]): Array[(Long, Seq[Double], Boolean)] = {
    import org.apache.spark.sql.functions.col
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), Scrub.repetitionSignals(col("text")).as("r"))
      .orderBy("id").collect()
      .map { r =>
        val s = r.getStruct(1)
        (s.getAs[Long]("n_lines"),
          sigNames.map(n => s.getAs[Double](n)),
          s.getAs[Boolean]("pass"))
      }
  }

  test("repetitionSignals: hand-computed masses on a duplicated-line doc") {
    // tokens [a a a b x x], lines [a a a b | x | x], chars = 11
    val Array((nLines, sig, pass)) = runSignals(Seq("a a a b\nx\nx"))
    assert(nLines == 3L)
    assert(sig(0) == 1.0 / 3.0)           // dup_line_frac: 1 repeat of 3
    assert(sig(1) == 2.0 / 9.0)           // "x" twice, 2 chars of 9 line chars
    assert(sig(2) == 6.0 / 11.0)          // top 2-gram "a a": 2·3 chars
    assert(sig(3) == 5.0 / 11.0)          // all 3-grams unique: 1·5
    assert(sig(4) == 7.0 / 11.0)          // "a a a b": 1·7
    assert(sig.drop(5).forall(_ == 0.0))  // no duplicated 5..10-grams
    assert(!pass)
  }

  test("repetitionSignals: clean long doc passes, looping doc fails") {
    val clean = (0 until 40).map(i => f"t$i%02d").mkString(" ")
    val loop = Seq.fill(30)("spam").mkString(" ")
    val Array((_, cleanSig, cleanPass), (_, _, loopPass)) =
      runSignals(Seq(clean, loop))
    assert(cleanPass, s"clean doc should pass, signals=$cleanSig")
    assert(cleanSig.drop(5).forall(_ == 0.0))
    assert(!loopPass)
  }

  test("repetitionSignals: overlapping dup-gram mass clamps to 1.0") {
    // 8×"w": four identical 5-grams, mass 4·9=36 > 15 chars
    val Array((_, sig, _)) = runSignals(Seq(Seq.fill(8)("w").mkString(" ")))
    assert(sig(5) == 1.0)
  }

  test("repetitionSignals: empty text yields zeros and passes") {
    val Array((nLines, sig, pass)) = runSignals(Seq(""))
    assert(nLines == 1L)
    assert(sig.forall(_ == 0.0))
    assert(pass)
  }

  test("repetitionSignals plan: pure per-row map — zero exchanges") {
    // the 100 TB contract: nine sort+fold passes per ROW, never a shuffle —
    // the operator must fuse into the scan like gopherGates does
    import org.apache.spark.sql.functions.col
    val df = (1L to 50L).map(i => (i, s"doc $i body\nline\nline"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Scrub.repetitionSignals(col("text")).as("r"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetitionSignals must be map-only:\n$plan")
  }

  test("repetitionSignals: exact differential vs naive reference on fixture docs") {
    import org.apache.spark.sql.functions._
    val planted = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
      .select(col("doc_id"),
        concat(col("text"), lit("\n"), substring(col("text"), 1, 40),
          lit("\n"), substring(col("text"), 1, 40),
          when(col("doc_id") % 3 === 0, lit("\nthe end"))
            .otherwise(lit(""))).as("text"))
    val texts = planted.orderBy("doc_id").collect().map(_.getString(1))
    val got = runSignals(texts.toSeq)
    texts.zip(got).foreach { case (t, (nLines, sig, pass)) =>
      val (eN, eSig, ePass) = naiveRepetition(t)
      assert(nLines == eN, s"n_lines for ${t.take(40)}")
      assert(sig == eSig, s"signals for ${t.take(40)}")
      assert(pass == ePass)
    }
  }

  // ---- encodingDamage ----

  test("encodingDamage: each damage class detects; clean text stays clean") {
    val df = Seq(
      ("g", "perfectly clean text"),
      ("g", "mangled cafÃ© word"),          // mojibake A3-hat
      ("g", "smart â€™ quote damage"),               // mojibake a-hat
      ("g", "decoder gave � up"),               // replacement char
      ("g", "stray \u0007 bell"),                    // C0 control
      ("g", "tabs\tand\nnewlines are fine")
    ).toDF("src", "text")
    val r = Scrub.encodingDamage(df, Seq("src"), "text").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((6L, 1L, 2L, 1L, 4L)))
    assert(r.getDouble(6) == 4.0 / 6.0)
    intercept[IllegalArgumentException] {
      Scrub.encodingDamage(df, Seq.empty, "text")
    }
  }

  test("encodingDamage: real accented text does not false-positive") {
    // proper UTF-8 é/ü/ñ and real right-quote ’ must NOT flag — the
    // patterns target the MANGLED forms only
    val df = Seq(("g", "café über mañana it’s fine")).toDF("src", "text")
    val r = Scrub.encodingDamage(df, Seq("src"), "text").collect().head
    assert(r.getLong(5) == 0L && r.getDouble(6) == 0.0)
  }

  test("encodingDamage: uppercase Portuguese Ã before ASCII is not mojibake") {
    // SÃO/JOÃO/NÃO have Ã followed by a plain letter — outside the
    // U+0080–U+00BF continuation range real UTF-8 damage maps to, so
    // they must pass while the mangled Ã© form still flags
    val df = Seq(("g", "SÃO PAULO and JOÃO said NÃO"),
      ("g", "mangled cafÃ© again")).toDF("src", "text")
    val r = Scrub.encodingDamage(df, Seq("src"), "text").collect().head
    assert(r.getLong(3) == 1L, "only the mangled doc may flag as mojibake")
  }

  // ---- piiIncidence ----

  test("piiIncidence: hand-planted counts and the replayed Wilson interval") {
    val df = Seq(
      ("g", "clean text one"),
      ("g", "write to a.b@corp.io today"),
      ("g", "mail x@y.org from 10.0.0.1"), // email AND ip: one flagged doc
      ("g", "clean text two"),
      ("g", "clean text three")
    ).toDF("src", "text")
    val r = Scrub.piiIncidence(df, Seq("src"), "text").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((5L, 2L, 1L, 0L, 2L)))
    val (z, z2) = (1.96, 1.96 * 1.96)
    val n = 5.0; val p = 2.0 / 5.0
    val denom = 1.0 + z2 / n
    val center = (p + z2 / (2.0 * n)) / denom
    val half = (z / denom) * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    assert(r.getDouble(6) == p)
    assert(r.getDouble(7) == math.max(0.0, center - half))
    assert(r.getDouble(8) == math.min(1.0, center + half))
  }

  test("piiIncidence: zero and saturated rates clamp to [0, 1]; bad args reject") {
    val clean = Seq(("g", "nothing here")).toDF("src", "text")
    val c = Scrub.piiIncidence(clean, Seq("src"), "text").collect().head
    assert(c.getDouble(6) == 0.0 && c.getDouble(7) == 0.0 && c.getDouble(8) > 0.0)
    val dirty = Seq(("g", "a@b.co"), ("g", "c@d.co")).toDF("src", "text")
    val d = Scrub.piiIncidence(dirty, Seq("src"), "text").collect().head
    assert(d.getDouble(6) == 1.0 && d.getDouble(8) == 1.0 && d.getDouble(7) < 1.0)
    intercept[IllegalArgumentException] {
      Scrub.piiIncidence(clean, Seq.empty, "text")
    }
    intercept[IllegalArgumentException] {
      Scrub.piiIncidence(clean, Seq("src"), "text", z = 0.0)
    }
  }

  test("canonicalUrl: case, www, default ports, slashes, tracking params, fragments") {
    val cases = Seq(
      // the kitchen sink: every rule at once
      "HTTPS://WWW.Shop.COM:443//products//x/?utm_source=n&b=2&a=1#top" ->
        Some("https://shop.com/products/x?a=1&b=2"),
      // http default port; trailing slash; param order already canonical
      "http://Blog.org:80/posts/p1/?a=1" -> Some("http://blog.org/posts/p1?a=1"),
      // non-default scheme keeps its port; no query
      "ftp://Files.example.com:21/data" -> Some("ftp://files.example.com:21/data"),
      // tracking-only query loses the '?'
      "http://a.net/x?gclid=abc" -> Some("http://a.net/x"),
      // bare host → root path
      "https://a.com" -> Some("https://a.com/"),
      // ref is a tracking param; empty params between &s vanish
      "https://a.com/p?ref=rss&&z=9" -> Some("https://a.com/p?z=9"),
      // non-URLs and empty hosts are NULL, not garbage
      "not a url" -> None,
      "http://" -> None
    )
    val got = Scrub.canonicalUrl(org.apache.spark.sql.functions.col("u"))
    val rows = cases.map(_._1).toDF("u").select(got.as("c")).collect()
      .map(r => Option(r.getString(0)))
    assert(rows.toSeq == cases.map(_._2),
      rows.toSeq.zip(cases).filter(p => p._1 != p._2._2).mkString("; "))
  }

  test("luhnCardIncidence: known valid/invalid PANs, lengths, formats") {
    val docs = Seq(
      // visa test PAN, spaced: valid
      ("a", "pay with 4111 1111 1111 1111 today"),
      // same digits +1: checksum fails
      ("a", "num 4111111111111112 here"),
      // amex 15-digit: valid; the 12-digit run is under the regex's
      // 13-char minimum (1+{11,21}+1) and never becomes a candidate
      ("a", "amex 378282246310005 and id 123456789012"),
      // dashed mastercard test PAN: valid
      ("b", "5555-5555-5555-4444"),
      // 20-digit run: candidate regex grabs it, length gate rejects
      ("b", "serial 41111111111111111111"),
      ("b", "no digits at all")).toDF("src", "text")
    val got = Scrub.luhnCardIncidence(docs, Seq("src"), "text")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("a", 3L, 2L, 3L, 2L, 2.0 / 3.0),
      ("b", 3L, 1L, 2L, 1L, 1.0 / 3.0)))
    intercept[IllegalArgumentException] {
      Scrub.luhnCardIncidence(docs, Seq.empty, "text")
    }
  }

  test("kAnonymity: class sizes, below-k mass, diversity, null quasi") {
    // classes by (region, age): (E,1): 3 rows sens {a,a,b} -> div 2
    //   (E,2): 1 row {a} -> below k=3, div 1
    //   (W,1): 2 rows {a, null} -> below k, div 2 (null counts)
    //   (null,1): 2 rows {a,a} -> below k, div 1
    val df = Seq(
      (Option("E"), 1, Option("a")), (Option("E"), 1, Option("a")),
      (Option("E"), 1, Option("b")),
      (Option("E"), 2, Option("a")),
      (Option("W"), 1, Option("a")), (Option("W"), 1, None),
      (None, 1, Option("a")), (None, 1, Option("a")))
      .toDF("region", "age", "sens")
    val r = Scrub.kAnonymity(df, Seq("region", "age"), "sens",
      k = 3L, l = 2L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getLong(5), r.getDouble(6)) ==
      ((8L, 4L, 1L, 5L, 5.0 / 8.0, 3L, 3.0 / 8.0)))
    intercept[IllegalArgumentException] {
      Scrub.kAnonymity(df, Seq.empty, "sens")
    }
  }
}
