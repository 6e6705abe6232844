package graft.offline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for co-located joins — the SURVEY §4 scale lever
  * for fact⋈fact joins that would otherwise shuffle both sides every
  * run (e.g. lineitem⋈orders at 100 TB): write both tables bucketed
  * by the join key once, and every subsequent join is exchange-free
  * on that key.
  *
  * Spark requires the catalog for bucketed writes (bucket metadata
  * lives in the table definition, not the files), so these register
  * managed tables in the session catalog / warehouse dir.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
