package graft.sources

import graft.SparkFunSuite

class BucketsSpec extends SparkFunSuite {
  import spark.implicits._

  test("co-located join of same-bucketed tables plans with zero Exchange") {
    // disable broadcast so the plan must choose bucket-to-bucket sort-merge
    // (warehouse.dir is a static conf; managed tables land in the default
    // warehouse and are dropped — which deletes their files — in finally)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
      Buckets.writeBucketed(a, "bkt_a", "k", 4)
      Buckets.writeBucketed(b, "bkt_b", "k", 4)
      val joined = Buckets.coLocatedJoin(spark, "bkt_a", "bkt_b", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
