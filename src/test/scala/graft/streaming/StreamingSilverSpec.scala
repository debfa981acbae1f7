package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkFunSuite
import graft.pipeline.Silver
import graft.pipeline.WeatherFixtures.BronzeRow

/** Batch/streaming unification for the weather pipeline itself: the SAME
  * Silver.transform (stateless column logic) runs over a bronze stream —
  * the engine's cleaning layer needs no streaming rewrite. */
class StreamingSilverSpec extends SparkFunSuite {

  test("Silver.transform applied to a bronze stream cleans rows per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[BronzeRow]
    val silver = Silver.transform(input.toDF())
    val q = silver.writeStream.outputMode("append")
      .format("memory").queryName("silver_stream").start()
    try {
      input.addData(
        graft.pipeline.WeatherFixtures.bronzeRow("Delhi", "2026-02-13", temp = 31.5),
        graft.pipeline.WeatherFixtures.bronzeRow("Delhi", "2026-02-13", temp = null))
      q.processAllAvailable()
      val rows = spark.table("silver_stream").collect()
      assert(rows.length == 1, "null-temperature row dropped in-stream")
      assert(rows.head.getAs[Double]("temperature") == 31.5)
      assert(rows.head.schema.fieldNames.toSeq == graft.pipeline.Schemas.silver.fieldNames.toSeq)
      input.addData(graft.pipeline.WeatherFixtures.bronzeRow("Tokyo", "2026-02-14", temp = 8.0))
      q.processAllAvailable()
      assert(spark.table("silver_stream").count() == 2)
    } finally q.stop()
  }
}
