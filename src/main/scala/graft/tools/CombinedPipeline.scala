package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Keywords, Profile, Retrieval}
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Measures the tokenize-once shared-intermediate win (the round-7 PLANS
  * item): the three term-keyed battery operators (q104 TF-IDF keywords,
  * q93 BM25 top-k, q106 corpus health) re-tokenize the same snapshot when
  * run standalone; their `*FromTf` forms share ONE
  * [[TextAnalysis.tfTable]]. q100's bigram LM is NOT shareable — its
  * corpus product is bigram counts, not the unigram (doc, term, tf)
  * table. Diagnostic main, not part of the battery.
  *
  * Usage: runMain graft.tools.CombinedPipeline <sfDir>
  */
object CombinedPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def docs = t.documentsSpread
    def queriesDf = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    def timed(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val c = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[combined] $name%-28s $sec%6.2f s  rows=$c")
      sec
    }
    // warm the scan cache once so both arms see hot files
    docs.count()
    val sep =
      timed("standalone q104")(Keywords.tfidfKeywords(docs, "doc_id", "text", k = 5).count()) +
      timed("standalone q93")(Retrieval.bm25TopK(docs, "doc_id", "text",
        queriesDf, "query_id", "qtext", k = 10).count()) +
      timed("standalone q106")(Profile.corpusHealth(docs, "source", "text", topN = 100).count())
    val t0 = System.nanoTime()
    val tf = TextAnalysis.tfTable(docs, "doc_id", "text", carryCols = Seq("source"))
    val tfBuild = (System.nanoTime() - t0) / 1e9
    println(f"[combined] tfTable build+checkpoint  $tfBuild%6.2f s")
    val shared = tfBuild +
      timed("fromTf q104")(Keywords.tfidfKeywordsFromTf(tf, "doc_id", k = 5).count()) +
      timed("fromTf q93")(Retrieval.bm25TopKFromTf(tf, "doc_id",
        queriesDf, "query_id", "qtext", k = 10).count()) +
      timed("fromTf q106")(Profile.corpusHealthFromTf(tf, "source", topN = 100).count())
    println(f"[combined] TOTAL standalone=$sep%6.2f s  shared=$shared%6.2f s  " +
      f"ratio=${sep / shared}%4.2f")
    spark.stop()
  }
}
