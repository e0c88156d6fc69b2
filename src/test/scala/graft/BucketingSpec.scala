package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketing (SURVEY §5): two tables bucketed on
  * the join key join WITHOUT any shuffle exchange — the physical
  * pattern that avoids re-shuffling a 100 TB fact table on every join.
  * Local demonstration at sf0.001; the same DDL scales unchanged. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans no shuffle exchange") {
    // external table paths (warehouse.dir is a static conf; tables are
    // written under a temp dir via explicit path options)
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_spec").toString
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    li.write.mode("overwrite")
      .bucketBy(8, "l_partkey").sortBy("l_partkey")
      .option("path", s"$wh/li_a").saveAsTable("li_a")
    li.groupBy("l_partkey").agg(sum("l_quantity").as("q")).write.mode("overwrite")
      .bucketBy(8, "l_partkey").sortBy("l_partkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_a").join(spark.table("li_b"), "l_partkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_a")
      spark.sql("DROP TABLE IF EXISTS li_b")
    }
  }
}
