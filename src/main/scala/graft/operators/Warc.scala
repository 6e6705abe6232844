package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.WarcRecords

/** Crawl-archive ingestion: WARC segments (binary cells, one crawl
  * file each — the shape `spark.read.format("binaryFile")` yields
  * over a Common-Crawl-style bucket) → one row per record, parsed by
  * the Content-Length-framed walker in
  * [[graft.functions.WarcRecords]]. `posexplode` is a narrow
  * operation: parsing happens in the scan stage and the raw archive
  * bytes never shuffle — only extracted fields flow downstream
  * (typically straight into [[Html.extract]]'s clean chain).
  */
object Warc {

  /** One row per parsed record: the segment's id column, `rec_idx`
    * (ordinal within the segment), and the record fields
    * (`warc_type`, `target_uri`, `warc_date`, `status`,
    * `content_type`, `body`). Unparseable segments yield no rows —
    * count them upstream via `warcRecords(...).isNull` if a
    * quarantine stream is wanted. */
  def records(segments: DataFrame, idCol: String, warcCol: String): DataFrame =
    segments
      .select(col(idCol), posexplode(WarcRecords.warcRecords(col(warcCol))))
      .withColumnRenamed("pos", "rec_idx")
      .select(col(idCol), col("rec_idx"), col("col.*"))
}
