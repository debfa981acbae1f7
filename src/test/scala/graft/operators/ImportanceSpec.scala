package graft.operators

import org.apache.spark.sql.Row

import graft.SparkFunSuite

class ImportanceSpec extends SparkFunSuite {
  import spark.implicits._

  private val Mod = 1000000007L
  private def polyHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 257L + c.toLong) % Mod)
  private def toks(s: String): Seq[String] =
    if (s == null) Nil
    else s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
      .trim.split(" ").filter(_.nonEmpty).toSeq

  /** Naive reference for the whole DSIR weight pipeline. */
  private def naiveLogW(raw: Seq[(Long, String)], target: Seq[String],
                        buckets: Int): Map[Long, (Long, Double)] = {
    def feats(s: String): Seq[Long] = {
      val t = toks(s)
      t.zip(t.drop(1)).map { case (a, b) => polyHash(a + " " + b) % buckets }
    }
    val ct = target.flatMap(feats).groupBy(identity)
      .map { case (b, v) => b -> v.size.toLong }
    val cr = raw.flatMap(d => feats(d._2)).groupBy(identity)
      .map { case (b, v) => b -> v.size.toLong }
    val nt = ct.values.sum
    val nr = cr.values.sum
    raw.map { case (id, text) =>
      val f = feats(text)
      val logw = f.foldLeft(0.0) { (a, b) =>
        a + (math.log((ct.getOrElse(b, 0L) + 1L).toDouble /
              (nt + buckets).toDouble) -
             math.log((cr.getOrElse(b, 0L) + 1L).toDouble /
              (nr + buckets).toDouble))
      }
      id -> (f.size.toLong, logw)
    }.toMap
  }

  private val raw = Seq(
    1L -> "spark shuffles data across the cluster",
    2L -> "spark shuffles data across partitions",
    3L -> "ducks swim on the quiet pond",
    4L -> "geese fly over the quiet pond",
    5L -> "x", // single token: no bigram features
    6L -> "", // no tokens at all
    7L -> (null: String)) // null text: feature-less, stays in the pool
  private val target = Seq(
    "spark shuffles data between stages",
    "spark moves data across the network")

  test("dsirLogWeights matches the naive reference and keeps feature-less docs") {
    val got = Importance.dsirLogWeights(raw.toDF("doc_id", "text"),
        target.toDF("text").withColumn("doc_id",
          org.apache.spark.sql.functions.lit(0L)),
        "doc_id", "text", buckets = 64)
      .collect().map { case Row(id: Long, n: Long, w: Double) => id -> (n, w) }
      .toMap
    val want = naiveLogW(raw, target, 64)
    assert(got.keySet === want.keySet)
    for ((id, (n, w)) <- want) {
      assert(got(id)._1 === n, s"n_feats for doc $id")
      assert(got(id)._2 === w, s"logw for doc $id (exact: same JVM ln, same fold order)")
    }
    assert(got(5L) === ((0L, 0.0)))
    assert(got(6L) === ((0L, 0.0)))
    assert(got(7L) === ((0L, 0.0))) // null text: feature-less, kept
    // Target-like docs outweigh off-distribution docs.
    assert(got(1L)._2 > got(3L)._2)
    assert(got(2L)._2 > got(4L)._2)
  }

  test("a feature-less target fails loudly instead of weighting by noise") {
    intercept[IllegalArgumentException] {
      Importance.dsirLogWeights(raw.toDF("doc_id", "text"),
        Seq("x", "").toDF("text") // no document with >= 2 tokens
          .withColumn("doc_id", org.apache.spark.sql.functions.lit(0L)),
        "doc_id", "text", buckets = 64)
    }
  }

  test("dsirResample replays the naive Gumbel top-k selection exactly") {
    val k = 3
    val buckets = 64
    val want = naiveLogW(raw, target, buckets).toSeq
      .map { case (id, (_, w)) =>
        val u = ((polyHash(id.toString + ":dsir").toDouble) + 0.5) / Mod.toDouble
        (id, w - math.log(-math.log(u)))
      }
      .sortBy { case (id, key) => (-key, id) }
      .take(k).map(_._1)
    val got = Importance.dsirResample(raw.toDF("doc_id", "text"),
        target.toDF("text").withColumn("doc_id",
          org.apache.spark.sql.functions.lit(0L)),
        "doc_id", "text", k = k, buckets = buckets)
      .orderBy("rank")
      .collect().map { case Row(_, id: Long, _, _) => id }.toSeq
    assert(got === want)
  }

  test("resample is deterministic across runs and bounded by k") {
    val rawDf = raw.toDF("doc_id", "text")
    val tgtDf = target.toDF("text").withColumn("doc_id",
      org.apache.spark.sql.functions.lit(0L))
    val a = Importance.dsirResample(rawDf, tgtDf, "doc_id", "text", k = 4)
      .orderBy("rank").collect().toSeq
    val b = Importance.dsirResample(rawDf, tgtDf, "doc_id", "text", k = 4)
      .orderBy("rank").collect().toSeq
    assert(a === b)
    assert(a.size === 4)
    assert(a.map { case Row(r: Int, _, _, _) => r } === Seq(1, 2, 3, 4))
    // k beyond the corpus returns every doc exactly once
    val all = Importance.dsirResample(rawDf, tgtDf, "doc_id", "text", k = 99)
      .collect().map { case Row(_, id: Long, _, _) => id }.toSeq
    assert(all.sorted === raw.map(_._1))
  }

  test("weights concentrate selection on target-like documents") {
    // 20 target-like docs vs 20 off-distribution docs. The groups must
    // not carry per-doc hapax bigrams (e.g. an embedded id): with a tiny
    // target corpus, add-one smoothing over the buckets makes EVERY
    // bigram's log-ratio negative, and hapax noise of the same magnitude
    // as the group separation lets the Gumbel draw flip ranks — measured
    // while building this spec. The target is repeated so nt is not
    // drowned by the smoothing mass (the same reason DSIR wants a
    // non-trivial target corpus).
    val rawBig =
      (1L to 20L).map(i => i -> "spark executes the job plan and writes the result") ++
      (21L to 40L).map(i => i -> "the heron wades along the reedy shore at dawn")
    val tgt = Seq.fill(3)(
      Seq("spark executes the job plan", "the job plan writes the result"))
      .flatten
    val sel = Importance.dsirResample(rawBig.toDF("doc_id", "text"),
        tgt.toDF("text").withColumn("doc_id",
          org.apache.spark.sql.functions.lit(0L)),
        "doc_id", "text", k = 10, buckets = 256)
      .collect().map { case Row(_, id: Long, _, _) => id }.toSeq
    assert(sel.forall(_ <= 20L), s"selected $sel")
  }

  test("dsirLogWeightsAmong == full weights filtered to the candidate pool") {
    // the candidate restriction must change WHICH rows are scored, never
    // a candidate's weight: bucket models still come from the full corpus
    import org.apache.spark.sql.functions.{col, lit, md5, concat}
    val raw = (1L to 120L).map(i =>
      (i, s"alpha beta w$i gamma w${i % 9} delta")).toDF("doc_id", "text")
    val tgt = raw.filter(col("doc_id") % 4 === 0)
    val cand = md5(concat(col("doc_id").cast("string"), lit(":x"))) < "80"
    val among = Importance.dsirLogWeightsAmong(raw, tgt, cand,
        "doc_id", "text", buckets = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Importance.dsirLogWeights(raw, tgt, "doc_id", "text", buckets = 128)
      .filter(cand)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(among.nonEmpty && among.size < 120, "pool must be a strict subset")
    assert(among === full,
      "candidate weights must be identical to the full-scoring weights")
  }
}
