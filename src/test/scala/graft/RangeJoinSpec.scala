package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def points = spark.range(1000)
    .select(col("id").as("pid"), (col("id") * 7 % 997).as("t"))

  private def intervals = spark.range(80)
    .select(col("id").as("iv_id"),
      (col("id") * 13 % 900).as("lo"),
      (col("id") * 13 % 900 + col("id") % 40).as("hi"))

  private def naive = points.crossJoin(intervals)
    .filter(col("lo") <= col("t") && col("t") < col("hi"))
    .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded join equals the naive theta join, any bucket width") {
    val want = naive
    for (b <- Seq(1L, 7L, 32L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "t", intervals,
          "lo", "hi", bucket = b)
        .select("pid", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"bucket $b diverges")
    }
    assert(want.nonEmpty)
  }

  test("half-open semantics: lo included, hi excluded; empty intervals dropped") {
    val pts = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "t")
    val ivs = Seq((100L, 10L, 20L), (200L, 30L, 30L), (300L, 40L, 35L))
      .toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "t", ivs, "lo", "hi", 8L)
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L), (2L, 100L))) // t=20 excluded; empty ivs gone
  }

  test("shared equi-keys scope intervals per entity") {
    val pts = Seq(("u1", 5L, 1L), ("u2", 5L, 2L)).toDF("user", "t", "pid")
    val ivs = Seq(("u1", 0L, 10L, 100L)).toDF("user", "lo", "hi", "iv_id")
    val got = RangeJoin.pointInInterval(pts, "t", ivs, "lo", "hi", 4L,
        keys = Seq("user"))
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L))) // u2's point matches nothing
  }

  test("auto bucket: median rule on a hand fixture; auto == manual join") {
    // lengths 2,4,6,8,10 → sorted sample index floor(0.5*(5-1)) = 2
    // → median length 6
    val ivs = Seq((1L, 0L, 2L), (2L, 10L, 14L), (3L, 20L, 26L),
      (4L, 30L, 38L), (5L, 40L, 50L)).toDF("iv_id", "lo", "hi")
    val choice = RangeJoin.chooseBucket(ivs, "lo", "hi")
    assert(choice.bucket === 6L)
    assert(choice.nIntervals === 5L)
    val want = RangeJoin.pointInInterval(points, "t", intervals,
        "lo", "hi", RangeJoin.chooseBucket(intervals, "lo", "hi").bucket)
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = RangeJoin.pointInIntervalAuto(points, "t", intervals,
        "lo", "hi")
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto === want && auto === naive)
  }

  test("auto bucket bounds replication on a pathological long-interval mix") {
    // 99 unit intervals + 1 interval spanning 100000: a mean-based
    // bucket (~1000) would replicate nothing but degrade selectivity;
    // the MEDIAN rule picks 1 and the audit reports the true cost —
    // the long interval's 100000 replicas averaged over 100 rows
    val ivs = spark.range(99)
      .select(col("id").as("iv_id"), (col("id") * 3).as("lo"),
        (col("id") * 3 + 1).as("hi"))
      .union(Seq((999L, 0L, 100000L)).toDF("iv_id", "lo", "hi"))
    val choice = RangeJoin.chooseBucket(ivs, "lo", "hi")
    assert(choice.bucket === 1L, "median must ignore the outlier")
    // exact expected replication: 99 singles × 1 + 1 × 100000 over 100
    assert(math.abs(choice.replication - (99.0 + 100000.0) / 100) < 1e-9)
    // the replication AUDIT is the alert channel: at bucket=1 the cost
    // is visible (1001×), not silently paid
    assert(choice.replication > 100)
  }

  test("plan is an equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "t", intervals,
      "lo", "hi", 32L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }
}
