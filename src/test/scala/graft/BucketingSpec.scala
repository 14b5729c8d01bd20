package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the pre-shuffle strategy for repeated
  * large-large joins at scale (SURVEY.md mapping of op #12's
  * co-location): both sides bucketed by the join key at write time
  * join with NO exchange at read time.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '$wh'")
    spark.sql("DROP TABLE IF EXISTS bktdb.li_b")
    spark.sql("DROP TABLE IF EXISTS bktdb.o_b")
    val t = Tables(spark, sf)
    t.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bktdb.li_b")
    t.orders.select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bktdb.o_b")

    // disable broadcast so the (bucketed) sort-merge path is exercised —
    // at real scale neither side of a fact-fact join broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bktdb.li_b")
        .join(spark.table("bktdb.o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // neither join input may shuffle: the only hash exchange allowed
      // is the tiny post-join aggregation one
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"bucketed join inputs must not shuffle:\n$p")
      assert(p.contains("Bucketed: true"), s"scans must be bucketed:\n$p")
      // sanity: same result as the unbucketed join
      val expected = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
