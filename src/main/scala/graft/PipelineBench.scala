package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Keywords, Profile, Retrieval, TextAnalysis}
import graft.sources.Tables

/** Measures the shared-tf-table pipeline against the same operators run
  * one-shot — the "score a crawl snapshot" shape where several term-keyed
  * operators (TF-IDF keywords, BM25 retrieval, corpus health) run over
  * ONE corpus. One-shot, each operator re-tokenizes the corpus; shared,
  * [[TextAnalysis.tfTable]] tokenizes once and all three consume cached
  * blocks. Prints one JSON line per mode (min of 3, noop-sink timing —
  * the Bench conventions).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PipelineBench"`. */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = Tables(spark, sfDir).documents
    def queries: DataFrame = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))

    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the q104/q93/q106 battery shapes, carrying `source` for health
    def oneShot(): Unit = {
      drain(Keywords.tfidfKeywords(docs, "doc_id", "text", k = 5))
      drain(Retrieval.bm25TopK(docs, "doc_id", "text", queries,
        "query_id", "qtext", k = 10))
      drain(Profile.corpusHealth(docs, "source", "text", topN = 100))
    }
    def shared(): Unit = {
      val tf = TextAnalysis.tfTable(docs, "doc_id", "text",
        carryCols = Seq("source"))
      drain(Keywords.tfidfKeywordsFromTf(tf, "doc_id", k = 5))
      drain(Retrieval.bm25TopKFromTf(tf, "doc_id", queries,
        "query_id", "qtext", k = 10))
      drain(Profile.corpusHealthFromTf(tf, "source", topN = 100))
    }

    // warm-up (codegen/parquet machinery), then min-of-3 per mode
    drain(docs.groupBy("source").count())
    def time(f: () => Unit): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f()
      (System.nanoTime() - t0) / 1e9
    }.min
    val tOne = time(oneShot)
    val tShared = time(shared)
    println(f"""{"metric":"tf_pipeline","one_shot_sec":$tOne%.2f,"shared_sec":$tShared%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
