package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join as a BUCKETED EQUI-JOIN — the
  * operator Spark does not have: a raw `lo <= t AND t < hi` join
  * predicate has no equality component, so Catalyst plans a
  * broadcast-nested-loop (or worse, a cartesian) — O(points ×
  * intervals) comparisons, the classic 100 TB scale-killer for
  * sessions-vs-events, validity-window, or campaign-window joins.
  *
  * The banding trick: pick a bucket width, replicate each interval
  * onto every bucket it overlaps (explode of a sequence — bounded by
  * interval_length/bucket + 1 rows), tag each point with its single
  * bucket, equi-join on the bucket (plus any shared keys), then
  * apply the exact range predicate as a post-filter. The join is now
  * hash-partitionable: both sides shuffle by (keys, bucket), work is
  * points + replicated-intervals + true-ish matches, never the cross
  * product. A point's bucket matches an interval's replica exactly
  * once, so no dedup pass is needed.
  *
  * Bucket width is the operator's dial: ~the median interval length
  * is a good default — too small replicates intervals, too large
  * degrades selectivity (many false candidates reach the filter).
  * Intervals are HALF-OPEN [lo, hi); empty intervals (hi <= lo) drop
  * out by construction.
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose
    * [loCol, hiCol) contains the point's `pointCol`, optionally also
    * matching shared equi-key columns (present in BOTH frames —
    * e.g. a user id for per-entity windows). Point/lo/hi are numeric
    * (epoch days/millis etc.; convert timestamps first). Output =
    * point columns ++ interval columns (names must not collide
    * beyond the shared keys).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucket: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val iv = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / bucket).cast("long"),
        floor((col(hiCol) - 1) / bucket).cast("long"))))
    val pts = points.withColumn("__bucket",
      floor(col(pointCol) / bucket).cast("long"))
    pts.join(iv, keys :+ "__bucket", "inner")
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
