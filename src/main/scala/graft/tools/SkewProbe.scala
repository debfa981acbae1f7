package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val level = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"testdata/$level/documents.parquet").limit(n)
      .repartition(64) // a 100 TB lake has thousands of files; the
                       // single-file fixture otherwise serializes the
                       // cpu-heavy map stages on one core (PLANS r10)
      .localCheckpoint(true)
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.1f s  rows=$c")
    }
    // candidate-size replication: segment buckets on (L, i, seg), index
    // side counts x probe side counts summed — the exact pre-distinct
    // candidate row count of editDistancePairs, without running the join
    val m = 3
    val keys = docs.select(col("doc_id"), substring(col("text"), 1, 40).as("key"))
      .withColumn("_len", length(col("key"))).filter(col("_len") >= m)
    def segStart(L: org.apache.spark.sql.Column, i: Int) =
      floor(lit(i.toDouble) * L.cast("double") / lit(m.toDouble)).cast("int")
    def segLen(L: org.apache.spark.sql.Column, i: Int) =
      segStart(L, i + 1) - segStart(L, i)
    val index = keys.select(col("_len").as("_la"),
        explode(array((0 until m).map { i =>
          struct(lit(i).as("i"), col("key").substr(segStart(col("_len"), i) + 1,
            segLen(col("_len"), i)).as("seg"))
        }: _*)).as("_s"))
      .select(col("_la").as("L"), col("_s.i").as("i"), col("_s.seg").as("seg"))
      .groupBy("L", "i", "seg").agg(count(lit(1)).as("ci"))
    val probe = keys.select(col("key"), col("_len").as("_lb"),
        explode(sequence(greatest(col("_len") - 2, lit(m)), col("_len"))).as("_L"))
      .select(col("key"), col("_lb"), col("_L"),
        explode(array((for { i <- 0 until m; d <- -2 to 2 } yield {
          struct(lit(i).as("i"), (segStart(col("_L"), i) + d).as("st"),
            segLen(col("_L"), i).as("ln"))
        }): _*)).as("_s"))
      .filter(col("_s.st") >= 0 && col("_s.st") + col("_s.ln") <= col("_lb"))
      .select(col("_L").as("L"), col("_s.i").as("i"),
        col("key").substr(col("_s.st") + 1, col("_s.ln")).as("seg"))
      .groupBy("L", "i", "seg").agg(count(lit(1)).as("cp"))
    val candCount = index.join(probe, Seq("L", "i", "seg"))
      .agg(sum(col("ci") * col("cp"))).collect().head.getLong(0)
    println(s"[probe] $level n=$n candidate rows (pre-distinct) = $candCount")
    timed(s"edit n=$n salt=1")(Dedup.editDistancePairs(keys, "doc_id", "key", maxDist = 2).count())
    timed(s"edit n=$n salt=32")(Dedup.editDistancePairs(keys, "doc_id", "key", maxDist = 2, salt = 32).count())
    timed(s"containment n=$n")(Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.9, maxBucket = 64).count())
    spark.stop()
  }
}
