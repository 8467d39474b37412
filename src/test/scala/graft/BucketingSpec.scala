package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

/** Co-located joins via bucketed tables: writing both sides bucketed by the
  * join key removes the shuffle from every subsequent equi-join on it —
  * asserted on the physical plan, with results identical to the plain join.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed orders ⋈ lineitem joins with NO shuffle exchange, same results") {
    val orders = Tables(spark, SparkTestBase.sf001, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val lineitem = Tables(spark, SparkTestBase.sf001, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4)
    try {
      val joined = Bucketing.readTable(spark, "orders_b")
        .join(Bucketing.readTable(spark, "lineitem_b"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n${plan.take(800)}")

      // same answer as the shuffled join of the raw tables
      val bucketedAgg = joined.agg(count(lit(1)), sum("l_quantity")).head()
      val plainAgg = orders.join(lineitem, Seq("o_orderkey"))
        .agg(count(lit(1)), sum("l_quantity")).head()
      assert(bucketedAgg === plainAgg)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned sink: partition-key filter prunes directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables(spark, SparkTestBase.sf001, "events")
    Bucketing.writePartitioned(events, dir, Seq("event_type"))

    val back = spark.read.parquet(dir).filter(col("event_type") === "error")
    val scan = back.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .get
    // the filter must land in PartitionFilters (directory pruning), not
    // remain a post-scan data filter over every file
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")),
      s"expected event_type in PartitionFilters, got: ${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount === 1,
      s"only the error partition may be read, got ${scan.selectedPartitions.partitionCount}")
    // and the data still round-trips
    assert(back.count() ===
      events.filter(col("event_type") === "error").count())
  }
}
