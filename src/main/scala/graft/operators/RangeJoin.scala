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

  /** The data-derived bucket width plus its provable cost: `bucket` =
    * the MEDIAN interval length (clamped to ≥ 1) from the
    * deterministic bottom-k-by-md5 sample — the quantile-sketch leg's
    * sampling idiom, so the choice is reproducible run-to-run — and
    * `replication` = the exact mean replicas per interval AT that
    * bucket (each interval lands on floor((hi-1)/b) - floor(lo/b) + 1
    * buckets), computed over the full interval table in the same
    * pass. Median is the robust default: too-small buckets replicate
    * long intervals, too-large ones degrade join selectivity, and
    * skewed interval-length mixes pull a mean far from where most
    * intervals live.
    */
  final case class BucketChoice(bucket: Long, replication: Double,
                                nIntervals: Long)

  def chooseBucket(intervals: DataFrame, loCol: String, hiCol: String,
                   sampleK: Int = 256): BucketChoice = {
    require(sampleK >= 1)
    val lens = intervals.filter(col(hiCol) > col(loCol))
      .select((col(hiCol) - col(loCol)).cast("long").as("len"),
        col(loCol).cast("long").as("lo"), col(hiCol).cast("long").as("hi"))
      .localCheckpoint(false) // feeds the sample AND the audit
    // deterministic uniform sample: global bottom-k by md5 of the
    // interval's content (duplicates collapse — harmless for a width
    // heuristic). orderBy+limit plans as TakeOrderedAndProject — the
    // distributed partial top-k — where a global row_number window
    // would funnel every interval through one partition.
    val sample = lens
      .withColumn("h", md5(concat_ws(":", col("lo"), col("hi"))))
      .distinct()
      .orderBy("h").limit(sampleK)
      .select("len")
      .collect().map(_.getLong(0)).sorted
    require(sample.nonEmpty, "no non-empty intervals to derive a bucket from")
    val bucket = math.max(1L, sample(((sample.length - 1) * 0.5).toInt))
    val audit = lens.agg(
        count(lit(1)).as("n"),
        avg(floor((col("hi") - 1) / bucket) - floor(col("lo") / bucket) +
          1).as("repl"))
      .head()
    BucketChoice(bucket, audit.getDouble(1), audit.getLong(0))
  }

  /** [[pointInInterval]] with the bucket derived from the interval
    * data itself ([[chooseBucket]]'s median rule) — the zero-dial
    * form. Callers who need the replication number (the thing to
    * alert on when a pathological long-interval mix sneaks in) call
    * [[chooseBucket]] directly and pass its bucket to the manual
    * overload; the join is identical at any width (spec-held), so
    * auto vs manual is purely a cost choice.
    */
  def pointInIntervalAuto(points: DataFrame, pointCol: String,
                          intervals: DataFrame, loCol: String,
                          hiCol: String, keys: Seq[String] = Nil,
                          sampleK: Int = 256): DataFrame =
    pointInInterval(points, pointCol, intervals, loCol, hiCol,
      chooseBucket(intervals, loCol, hiCol, sampleK).bucket, keys)
}
