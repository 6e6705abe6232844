package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for aggregations whose key distribution is
  * pathological (one entity producing a large share of all events —
  * common in clickstream data, where AQE's skew handling only covers
  * joins, not aggregates).
  *
  * Two-stage salted aggregate: stage 1 groups on (key, salt) so a hot
  * key's rows spread over `salts` reducers; stage 2 merges the
  * partials. Costs one extra (tiny) shuffle; bounds any single
  * reducer's load at 1/salts of the hottest key. Sums here are
  * decimal-exact, so re-aggregating partials is lossless and
  * order-independent.
  */
object Skew {

  def saltedAgg(df: DataFrame, key: String, value: String, salts: Int)
  : DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(value).cast("decimal(18,2)")).as("_s"))
      .groupBy(col(key).as("entity_id"))
      .agg(
        sum(col("_n")).as("n"),
        sum(col("_s")).cast("double").as("total"))
  }
}
