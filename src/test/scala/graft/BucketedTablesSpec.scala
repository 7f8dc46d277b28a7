package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Bucketing = the at-rest co-location path: a join of two tables
  * bucketed on the same key with the same bucket count must plan with
  * ZERO Exchange operators — the write-time shuffle replaces every
  * query-time shuffle. This is the plan shape that makes repeated
  * 100 TB joins affordable.
  */
class BucketedTablesSpec extends SparkSpec {

  test("same-key same-count bucketed join and aggregation plan with no Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    // force the sort-merge path: at real scale neither side broadcasts —
    // that is exactly the case bucketing exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.writeBucketed(events, "ev_a", s"$dir/a", Seq("user_id"), buckets = 8)
      Tables.writeBucketed(events.withColumnRenamed("value", "value_b"),
        "ev_b", s"$dir/b", Seq("user_id"), buckets = 8)

      val joined = spark.table("ev_a").join(spark.table("ev_b"), "user_id")
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$joinPlan")
      assert(joined.count() > 0)

      // partial+final aggregation collapses onto the bucket distribution
      val agg = spark.table("ev_a").groupBy("user_id").agg(sum("value"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$aggPlan")
      assert(agg.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_a")
      spark.sql("DROP TABLE IF EXISTS ev_b")
    }
  }
}
