package graft.operators

import graft.SparkFunSuite

class ProfileSpec extends SparkFunSuite {
  import spark.implicits._

  test("per-column stats, nulls and means on a known frame") {
    val df = Seq(
      (Some(1.0), 2.0),
      (None: Option[Double], 4.0),
      (Some(3.0), 4.0)
    ).toDF("a", "b")
    val out = Profile.numericProfile(df, Seq("a", "b"))
      .orderBy("col_name").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = out(0)
    assert(a.getAs[Long]("n") == 3 && a.getAs[Long]("n_null") == 1 &&
      a.getAs[Long]("n_distinct") == 2)
    assert(a.getAs[Double]("min_v") == 1.0 && a.getAs[Double]("max_v") == 3.0)
    assert(a.getAs[Double]("sum_v") == 4.0 && a.getAs[Double]("mean_v") == 2.0)
    val b = out(1)
    assert(b.getAs[Long]("n_null") == 0 && b.getAs[Long]("n_distinct") == 2)
    assert(b.getAs[Double]("mean_v") == 10.0 / 3)
  }

  test("all columns profile in ONE scan of the source (not one per column)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = Profile.numericProfile(df,
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly one file scan, found $scans:\n$plan")
  }

  test("an all-null column yields a null mean, not a division blowup") {
    val df = Seq((Option.empty[Double], 1.0), (Option.empty[Double], 2.0))
      .toDF("a", "b")
    val a = Profile.numericProfile(df, Seq("a")).head
    assert(a.getAs[Long]("n_null") == 2)
    assert(a.isNullAt(a.fieldIndex("mean_v")))
  }

  test("sliceDivergence: identical slices score 0, disjoint slices score ln 2") {
    // two slices with IDENTICAL token distributions -> each slice's
    // distribution equals the corpus distribution -> JSD exactly 0
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("src", "text")
    val jsdSame = Profile.sliceDivergence(same, "src", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(jsdSame.values.forall(_ == 0.0), s"identical slices must be 0: $jsdSame")
    // a slice disjoint from the rest of an equal-size corpus: p=0 or
    // q=2p halves; JSD(P, M) with M the 50/50 mixture = ln 2 - ... the
    // hand value: each slice has jsd = sum_p p*ln(2p/(p+q)) terms; with
    // q = p/2 on its own tokens and p = 0 elsewhere. Just assert the
    // symmetric bound: both slices equal, strictly positive, <= ln 2
    val disj = Seq(("a", "x y z"), ("b", "u v w")).toDF("src", "text")
    val jsdDisj = Profile.sliceDivergence(disj, "src", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(jsdDisj("a") == jsdDisj("b"), s"symmetric construction: $jsdDisj")
    assert(jsdDisj("a") > 0.19 && jsdDisj("a") <= math.log(2.0) + 1e-9,
      s"disjoint-slice JSD out of range: $jsdDisj")
    // a drifted slice scores strictly between the two extremes
    val mix = Seq(("a", "x y z"), ("b", "x y u")).toDF("src", "text")
    val jsdMix = Profile.sliceDivergence(mix, "src", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(jsdMix("b") > 0.0 && jsdMix("b") < jsdDisj("b"),
      s"partial drift must land between identical and disjoint: $jsdMix vs $jsdDisj")
  }

  test("sliceDivergence matches a hand-computed two-slice value") {
    // corpus: slice a = {x:2, y:1}, slice b = {x:1}; corpus = {x:3, y:1}
    val df = Seq(("a", "x x y"), ("b", "x")).toDF("src", "text")
    def term(c: Long, st: Long, cc: Long, ct: Long): Double = {
      val p = c.toDouble / st.toDouble
      val q = cc.toDouble / ct.toDouble
      (if (c > 0) p * math.log(2.0 * p / (p + q)) else 0.0) +
        q * math.log(2.0 * q / (p + q))
    }
    def rf6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // fold in token order (x, y) from 0.0, halve, floor-round at 6dp
    val wantA = rf6((0.0 + term(2, 3, 3, 4) + term(1, 3, 1, 4)) / 2.0)
    val wantB = rf6((0.0 + term(1, 1, 3, 4) + term(0, 1, 1, 4)) / 2.0)
    val got = Profile.sliceDivergence(df, "src", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == wantA, s"slice a: got ${got("a")}, want $wantA")
    assert(got("b") == wantB, s"slice b: got ${got("b")}, want $wantB")
  }

  test("oovRate: exact counts against the deterministic top-k vocab") {
    // counts: x:4, y:3, z:2, w:1 -> top-2 vocab = {x, y}
    val df = Seq(
      (1L, "x x y z"), (2L, "x y z w"), (3L, "x y"), (4L, "")).toDF("id", "text")
    val got = Profile.oovRate(df, "id", "text", k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 1L, 0.25)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((4L, 2L, 0.5)), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((2L, 0L, 0.0)), s"doc 3: ${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0.0)), "empty doc must report 0/0/0.0")
  }

  test("oovRate: count ties break by token asc; k beyond vocab means zero OOV") {
    // z and a tie at 2 -> rank orders (count desc, token asc): a before z
    val df = Seq((1L, "a a z z b")).toDF("id", "text")
    val withK2 = Profile.oovRate(df, "id", "text", k = 2).head
    // top-2 = {a, z}? counts: a:2, z:2, b:1 -> ties a<z, both in top-2
    assert(withK2.getLong(2) == 1L, s"only b is OOV: $withK2")
    val withK1 = Profile.oovRate(df, "id", "text", k = 1).head
    // top-1 = {a} (tie broken toward 'a') -> z:2 + b:1 OOV
    assert(withK1.getLong(2) == 3L, s"tie must break to 'a': $withK1")
    assert(Profile.oovRate(df, "id", "text", k = 100).head.getLong(2) == 0L)
  }

  test("distinctNgramDiversity: hand-computed cells, short-doc zeros, layout invariance") {
    // src A: "a b a b" + "a b" -> unigrams 6 total/2 distinct; bigrams
    // {a b, b a, a b} + {a b} = 4 total/2 distinct; trigrams {a b a, b a b}
    // = 2 total/2 distinct. src B: one 1-token doc -> no bigrams/trigrams.
    val df = Seq(("A", "a b a b"), ("A", "a b"), ("B", "q"))
      .toDF("source", "text")
    val got = Profile.distinctNgramDiversity(df, "source", "text", maxN = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("A", 1)) == ((2L, 6L, 2.0 / 6.0)))
    assert(got(("A", 2)) == ((2L, 4L, 2.0 / 4.0)))
    assert(got(("A", 3)) == ((2L, 2L, 1.0)))
    assert(got(("B", 1)) == ((1L, 1L, 1.0)))
    assert(got(("B", 2)) == ((0L, 0L, 0.0)), "gram-less cell must survive as zeros")
    assert(got(("B", 3)) == ((0L, 0L, 0.0)))
    assert(got.size == 6, "exactly (groups x maxN) cells")
    val shuffled = Profile.distinctNgramDiversity(
        df.repartition(5), "source", "text", maxN = 3)
      .orderBy("source", "n").collect().toSeq
    val base = Profile.distinctNgramDiversity(df, "source", "text", maxN = 3)
      .orderBy("source", "n").collect().toSeq
    assert(base == shuffled)
  }

  test("vocabTail: hand-computed counts and divisions on a tiny corpus") {
    // tokens: a a a b b c  ->  N=6, V=3, hapax=1 (c), dis=1 (b),
    // rep2 = 3*2 + 2*1 + 0 = 8; simpson = 8/30
    val df = Seq(("g", "a a a b b c")).toDF("source", "text")
    val r = Profile.vocabTail(df, "source", "text").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((6L, 3L, 1L, 1L)))
    assert(r.getDouble(5) == 1.0 / 3.0)
    assert(r.getDouble(6) == 1.0 / 6.0)
    assert(r.getDouble(7) == 8.0 / 30.0)
  }

  test("vocabTail: an all-hapax group and a single-token group") {
    val df = Seq(("u", "x y z"), ("s", "w")).toDF("source", "text")
    val out = Profile.vocabTail(df, "source", "text").orderBy("source")
      .collect()
    val s = out(0); val u = out(1)
    // single token: N=1 -> simpson null
    assert(s.getLong(1) == 1L && s.getDouble(6) == 1.0 && s.isNullAt(7))
    assert(u.getLong(3) == 3L && u.getDouble(5) == 1.0 &&
      u.getDouble(7) == 0.0)
  }

  test("giniConcentration: hand-computed value, even mass, full concentration, zero total") {
    def g(ws: (String, Long)*): (Long, Long, Double) = {
      val r = Profile.giniConcentration(ws.toSeq.toDF("g", "w"), "g", "w")
        .collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    // weights 1,2,3,4: sum((2i-n-1)x) = -3-2+3+12 = 10; 10/(4*10) = 0.25
    assert(g("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L) == ((4L, 10L, 0.25)))
    assert(g("a" -> 5L, "b" -> 5L, "c" -> 5L)._3 == 0.0)
    // all mass in one of n groups -> (n-1)/n
    assert(g("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 12L)._3 == 0.75)
    assert(g("a" -> 0L, "b" -> 0L) == ((2L, 0L, 0.0)))
  }

  test("heapsLaw: hand-computed growth curve; oversized checkpoints drop") {
    val df = Seq((1L, "g", "a b a"), (2L, "g", "b c"), (3L, "g", "d"))
      .toDF("doc_id", "source", "text")
    val out = Profile.heapsLaw(df, "source", "doc_id", "text",
        checkpoints = Seq(1L, 2L, 4L))
      .orderBy("checkpoint").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("g", 1L, 3L, 2L), ("g", 2L, 5L, 3L)))
  }

  test("heapsLaw: an empty document occupies a rank but adds nothing") {
    val df = Seq((1L, "g", ""), (2L, "g", "a"))
      .toDF("doc_id", "source", "text")
    val out = Profile.heapsLaw(df, "source", "doc_id", "text",
        checkpoints = Seq(1L, 2L))
      .orderBy("checkpoint").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 1L)))
  }

  test("heapsLaw: groups stay independent; bad checkpoints reject") {
    val df = Seq((1L, "g1", "a"), (2L, "g2", "x y"), (3L, "g2", "x"))
      .toDF("doc_id", "source", "text")
    val out = Profile.heapsLaw(df, "source", "doc_id", "text", Seq(1L, 2L))
      .orderBy("source", "checkpoint").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("g1", 1L, 1L, 1L),
      ("g2", 1L, 2L, 2L), ("g2", 2L, 3L, 2L)))
    intercept[IllegalArgumentException] {
      Profile.heapsLaw(df, "source", "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Profile.heapsLaw(df, "source", "doc_id", "text", Seq(0L))
    }
    intercept[IllegalArgumentException] {
      Profile.heapsLaw(df, "source", "doc_id", "text", Seq(1L, 1L))
    }
  }

  test("zipfSlope: a perfect 1/rank corpus fits slope -1 exactly") {
    // counts 24/r for ranks 1..4: y = ln24 - 1*x exactly, so the LS fit
    // is (slope, intercept) = (-1, ln 24) up to fp, inside the 6dp grain
    val text = (Seq.fill(24)("a") ++ Seq.fill(12)("b") ++
      Seq.fill(8)("c") ++ Seq.fill(6)("d")).mkString(" ")
    val out = Profile.zipfSlope(
        Seq(("s1", text)).toDF("source", "text"), "source", "text")
      .collect().head
    assert(out.getLong(1) == 4L)
    assert(out.getDouble(2) == -1.0)
    assert(out.getDouble(3) == math.floor(math.log(24.0) * 1e6 + 0.5) / 1e6)
  }

  test("zipfSlope: hand-computed two-point fit, count ties rank by token asc") {
    // counts: a=3, b=3, c=1 -> ranks a=1, b=2, c=3 (tie a<b)
    val text = "a a a b b b c"
    val out = Profile.zipfSlope(
        Seq(("s", text)).toDF("source", "text"), "source", "text", topK = 2)
      .collect().head
    // topK=2 keeps ranks 1,2: points (0, ln3), (ln2, ln3) -> slope 0
    assert(out.getLong(1) == 2L)
    assert(out.getDouble(2) == 0.0)
    assert(out.getDouble(3) == math.floor(math.log(3.0) * 1e6 + 0.5) / 1e6)
  }

  test("zipfSlope: a single-token vocabulary reports null fit, not a NaN") {
    val out = Profile.zipfSlope(
        Seq(("s", "only only only")).toDF("source", "text"),
        "source", "text")
      .collect().head
    assert(out.getLong(1) == 1L)
    assert(out.isNullAt(2) && out.isNullAt(3))
  }

  test("zipfSlope rejects bad arguments and reserved columns") {
    val df = Seq(("s", "a b")).toDF("source", "text")
    intercept[IllegalArgumentException] {
      Profile.zipfSlope(df, "source", "text", topK = 1)
    }
    intercept[IllegalArgumentException] {
      Profile.zipfSlope(
        df.withColumn("_r", org.apache.spark.sql.functions.lit(1)),
        "source", "text")
    }
  }

  test("paretoClasses: exact integer boundaries, inclusive-A rule, tail classes") {
    val df = Seq(("a", 80.0), ("b", 15.0), ("c", 4.0), ("d", 1.0))
      .toDF("src", "v")
    val got = Profile.paretoClasses(df, "src", "v").orderBy("abc_class").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_keys"),
        r.getAs[Double]("total_value"), r.getAs[Double]("share"))).toSeq
    // cum 80 -> A (exactly 4/5, inclusive), cum 95 -> B (exactly 19/20),
    // c and d -> C
    assert(got == Seq(("A", 1L, 80.0, 0.8), ("B", 1L, 15.0, 0.15),
      ("C", 2L, 5.0, 0.05)))
  }

  test("paretoClasses: a dominant first key is A even past 80%") {
    val df = Seq(("a", 99.0), ("b", 1.0)).toDF("src", "v")
    val got = Profile.paretoClasses(df, "src", "v").orderBy("abc_class").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_keys"))).toSeq
    assert(got.head == ("A", 1L))
  }

  test("chiSquareIndependence: textbook 2x2 table, zero cells count") {
    // classic 2x2: O = [[10, 20], [30, 40]], N = 100
    // E = [[12, 18], [28, 42]]; chi2 = 4/12 + 4/18 + 4/28 + 4/42
    //    = 0.7936507936507937; dof = 1; V = sqrt(chi2/100)
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(40)(("y", "v"))
    val got = Profile.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .orderBy("val_a", "val_b").collect()
    assert(got.length == 4)
    val chi2 = got.head.getAs[Double]("chi2_total")
    val expected = 4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42
    assert(chi2 == expected)
    assert(got.head.getAs[Long]("dof") == 1L)
    assert(got.head.getAs[Double]("cramers_v") == math.sqrt(expected / 100.0))
    assert(got.map(r => (r.getString(0), r.getString(1),
      r.getAs[Long]("n_obs"), r.getAs[Double]("expected"))).toSeq ==
      Seq(("x", "u", 10L, 12.0), ("x", "v", 20L, 18.0),
        ("y", "u", 30L, 28.0), ("y", "v", 40L, 42.0)))
    // a grid cell with NO observations still contributes E to chi2:
    // drop (y, u) entirely -> cell (y,u) has n_obs 0 but expected > 0
    val sparse = rows.filterNot(t => t == ("y", "u"))
    val g2 = Profile.chiSquareIndependence(sparse.toDF("a", "b"), "a", "b")
      .orderBy("val_a", "val_b").collect()
    val zc = g2.find(r => r.getString(0) == "y" && r.getString(1) == "u").get
    assert(zc.getAs[Long]("n_obs") == 0L && zc.getAs[Double]("expected") > 0.0)
    // perfectly independent table -> chi2 exactly 0
    val ind = Seq.fill(6)(("x", "u")) ++ Seq.fill(6)(("x", "v")) ++
      Seq.fill(6)(("y", "u")) ++ Seq.fill(6)(("y", "v"))
    val g3 = Profile.chiSquareIndependence(ind.toDF("a", "b"), "a", "b")
      .collect()
    assert(g3.head.getAs[Double]("chi2_total") == 0.0)
  }

  test("correlationMatrix: hand values, pairwise deletion, constant null") {
    // a vs b: perfect line (r = 1 via the fixed-order form);
    // a vs c: perfect inverse; b vs c likewise; one scan, 3 pairs
    val df = Seq(
      (Some(1.0), Some(2.0), Some(3.0)),
      (Some(2.0), Some(4.0), Some(2.0)),
      (Some(3.0), Some(6.0), Some(1.0)),
      (Some(4.0), None, Some(0.0)),
      (None, Some(9.0), Some(9.0))).map { case (a, b, c) =>
      (a.map(double2Double).orNull, b.map(double2Double).orNull,
        c.map(double2Double).orNull)
    }.toDF("a", "b", "c")
    val got = Profile.correlationMatrix(df, Seq("a", "b", "c"))
      .orderBy("col_a", "col_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    // a-b uses only the 3 complete rows (pairwise deletion): x=[1,2,3],
    // y=[2,4,6]: num = 3·28−6·12 = 12, denx = 3·14−36 = 6,
    // deny = 3·56−144 = 24 → 12/(√6·√24)
    val ab = 12.0 / (math.sqrt(6.0) * math.sqrt(24.0))
    // a-c: x=[1,2,3,4], y=[3,2,1,0]: num = 4·10−10·6 = −20,
    // denx = 4·30−100 = 20, deny = 4·14−36 = 20
    val ac = -20.0 / (math.sqrt(20.0) * math.sqrt(20.0))
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq(("a", "b", 3L), ("a", "c", 4L), ("b", "c", 4L)))
    assert(got(0)._4 == ab && got(1)._4 == ac)
    // a constant column correlates null (not NaN) with everything
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "k")
    val c2 = Profile.correlationMatrix(const, Seq("x", "k")).head
    assert(c2.isNullAt(3))
    // exactly one scan feeds all pairs
    val plan = Profile.correlationMatrix(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      Seq("l_quantity", "l_extendedprice", "l_discount"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, found $scans")
    intercept[IllegalArgumentException] {
      Profile.correlationMatrix(df, Seq("a"))
    }
    intercept[IllegalArgumentException] {
      Profile.correlationMatrix(df, Seq("a", "a"))
    }
  }

  test("mutualInformation: independence is 0, determinism is H, NMI bounds") {
    // perfectly independent 2x2 -> MI exactly 0 (each term ln(1) = 0)
    val ind = Seq.fill(6)(("x", "u")) ++ Seq.fill(6)(("x", "v")) ++
      Seq.fill(6)(("y", "u")) ++ Seq.fill(6)(("y", "v"))
    val gi = Profile.mutualInformation(ind.toDF("a", "b"), "a", "b").head
    assert(gi.getAs[Double]("mi") == 0.0)
    assert(gi.getAs[Long]("n") == 24L && gi.getAs[Long]("n_cells") == 4L)
    assert(gi.getAs[Double]("nmi") == 0.0)
    // b fully determined by a (bijection, uniform): MI = H(A) = H(B) =
    // ln 2, NMI = 1 (all at the 6dp rounding grain)
    val det = Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("y", "v"))
    val gd = Profile.mutualInformation(det.toDF("a", "b"), "a", "b").head
    val ln2r = math.floor(math.log(2.0) * 1e6 + 0.5) / 1e6
    assert(gd.getAs[Double]("mi") == ln2r)
    assert(gd.getAs[Double]("h_a") == ln2r && gd.getAs[Double]("h_b") == ln2r)
    assert(math.abs(gd.getAs[Double]("nmi") - 1.0) < 1e-9)
    // one-level column: zero entropy -> null NMI, MI 0
    val one = Seq(("x", "u"), ("x", "v"), ("x", "u")).toDF("a", "b")
    val go = Profile.mutualInformation(one, "a", "b").head
    assert(go.getAs[Double]("mi") == 0.0 && go.getAs[Double]("h_a") == 0.0)
    assert(go.isNullAt(go.fieldIndex("nmi")))
    // hand-computed skewed 2x2: O = [[2,1],[1,2]], N = 6
    val sk = Seq.fill(2)(("x", "u")) ++ Seq(("x", "v"), ("y", "u")) ++
      Seq.fill(2)(("y", "v"))
    val gs = Profile.mutualInformation(sk.toDF("a", "b"), "a", "b").head
    def t(o: Double) = (o / 6.0) * math.log((o / 6.0) / (0.5 * 0.5))
    val want = math.floor((t(2) + t(1) + t(1) + t(2)) * 1e6 + 0.5) / 1e6
    assert(gs.getAs[Double]("mi") == want)
  }

  test("psiDrift: identical samples 0, shift positive, clamping, smoothing") {
    // identical ref/cur multisets → every p_cur == p_ref → PSI exactly 0
    val same = (1 to 50).flatMap(i =>
      Seq(("g", true, i.toDouble % 10), ("g", false, i.toDouble % 10)))
      .toDF("g", "is_ref", "v")
    val s0 = Profile.psiDrift(same, Seq("g"), "is_ref", "v",
      nBins = 10, loMicro = 0L, hiMicro = 10000000L).head
    assert(s0.getAs[Double]("psi") == 0.0)
    assert(s0.getAs[Long]("n_ref") == 50L && s0.getAs[Long]("n_cur") == 50L)
    // a clear shift scores positive and beyond the 0.25 folklore line
    val shifted = ((1 to 50).map(_ => ("g", true, 1.0)) ++
      (1 to 50).map(_ => ("g", false, 8.0))).toDF("g", "is_ref", "v")
    val s1 = Profile.psiDrift(shifted, Seq("g"), "is_ref", "v",
      nBins = 10, loMicro = 0L, hiMicro = 10000000L).head
    assert(s1.getAs[Double]("psi") > 0.25, s1.toString)
    // out-of-range values clamp into edge bins (the bins partition the
    // line): -99 and +99 land in bins 0 and 9, both samples identical
    val clamp = Seq(("g", true, -99.0), ("g", false, -99.0),
      ("g", true, 99.0), ("g", false, 99.0)).toDF("g", "is_ref", "v")
    val s2 = Profile.psiDrift(clamp, Seq("g"), "is_ref", "v",
      nBins = 10, loMicro = 0L, hiMicro = 10000000L).head
    assert(s2.getAs[Double]("psi") == 0.0)
    // hand-computed smoothed 2-bin case: ref = [3 in bin0], cur = [3 in
    // bin1]; smoothed p_ref = (4/5, 1/5), p_cur = (1/5, 4/5)
    val tiny = (Seq.fill(3)(("g", true, 0.0)) ++ Seq.fill(3)(("g", false, 6.0)))
      .toDF("g", "is_ref", "v")
    val s3 = Profile.psiDrift(tiny, Seq("g"), "is_ref", "v",
      nBins = 2, loMicro = 0L, hiMicro = 10000000L).head
    val t0 = (1.0 / 5 - 4.0 / 5) * math.log((1.0 / 5) / (4.0 / 5))
    val t1 = (4.0 / 5 - 1.0 / 5) * math.log((4.0 / 5) / (1.0 / 5))
    val want = math.floor(((0.0 + t0) + t1) * 1e6 + 0.5) / 1e6
    assert(s3.getAs[Double]("psi") == want)
    intercept[IllegalArgumentException] {
      Profile.psiDrift(same, Seq("g"), "is_ref", "v", nBins = 1)
    }
    intercept[IllegalArgumentException] {
      Profile.psiDrift(same, Seq("g"), "is_ref", "v",
        loMicro = 5L, hiMicro = 5L)
    }
  }

  test("chiSquareIndependence: degenerate 1-level column, nulls excluded") {
    val df = Seq(Some("x") -> Some("u"), Some("x") -> Some("v"),
      Some("x") -> Some("u"), None -> Some("u"), Some("x") -> None)
      .map { case (a, b) => (a.orNull, b.orNull) }.toDF("a", "b")
    val got = Profile.chiSquareIndependence(df, "a", "b")
      .orderBy("val_a", "val_b").collect()
    // one row level: dof = 0, V defined as 0.0 (not NaN), 2 cells
    assert(got.length == 2)
    assert(got.head.getAs[Long]("dof") == 0L)
    assert(got.head.getAs[Double]("cramers_v") == 0.0)
    // null-keyed rows were excluded: N = 3
    assert(got.map(_.getAs[Long]("n_obs")).sum == 3L)
    // empty input -> empty output, no NaN row
    val empty = Profile.chiSquareIndependence(
      df.filter($"a" === "never"), "a", "b")
    assert(empty.count() == 0L)
  }
}
