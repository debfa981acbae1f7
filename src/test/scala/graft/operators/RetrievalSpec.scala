package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class RetrievalSpec extends SparkFunSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark engine shuffles data across the cluster"),
    (2L, "the spark optimizer prunes columns and pushes filters"),
    (3L, "ducks swim on the quiet pond"),
    (4L, "pond ducks eat bread near the pond shore"), // 'pond' tf=2
    (5L, "")
  ).toDF("doc_id", "text")

  test("bm25TopK: query terms retrieve the right docs in the right order") {
    val queries = Seq((100L, "pond ducks"), (200L, "spark optimizer")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 3)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // qid 100: docs 3/4 match both terms (4 has pond twice but is longer);
    // qid 200: doc 2 matches both terms, doc 1 only 'spark'
    val byQuery = got.groupBy(_._1)
    assert(byQuery(100L).map(_._3).toSet == Set(3L, 4L))
    assert(byQuery(200L).map(_._3).toSeq == Seq(2L, 1L))
  }

  test("bm25TopK: self-retrieval ranks the source document first") {
    val queries = corpus.filter(col("doc_id") <= 2)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 2)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("bm25TopK: deterministic across recomputation; empty query matches nothing") {
    val queries = Seq((1L, "spark data"), (2L, "")).toDF("qid", "qtext")
    val a = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 5)
    val b = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 5)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.filter(col("qid") === 2L).count() == 0)
  }
}
