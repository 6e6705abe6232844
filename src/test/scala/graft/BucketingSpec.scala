package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.offline.Bucketing

class BucketingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("bucketed fact-fact join runs with NO exchange on either side") {
    Bucketing.writeBucketed(Tables.lineitem(spark, TestSpark.sfDir),
      "li_b", "l_orderkey", 4, sortCol = Some("l_orderkey"))
    Bucketing.writeBucketed(Tables.orders(spark, TestSpark.sfDir),
      "ord_b", "o_orderkey", 4, sortCol = Some("o_orderkey"))

    val joined = Bucketing.table(spark, "li_b")
      .join(Bucketing.table(spark, "ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("qty"))
    // force a merge join so broadcast doesn't mask the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      val exchangesBeforeAgg = plan.split("HashAggregate").last
      assert(!exchangesBeforeAgg.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
