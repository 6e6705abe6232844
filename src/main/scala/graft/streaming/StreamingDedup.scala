package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-dedup for a document ingest pipeline: the first
  * arrival of each normalized-content fingerprint passes through,
  * later duplicates are dropped. State is one boolean per distinct
  * fingerprint, sharded by the groupByKey shuffle — the streaming
  * analogue of Dedup.exact, and the shape a 100 TB ingest firehose
  * needs (per-key state, no global structure).
  */
object StreamingDedup {

  case class Doc(doc_id: Long, text: String)

  /** Normalized content fingerprint (same normalization as
    * TextAnalysis.fingerprint: lowercase, collapse spaces, trim, md5).
    */
  def fingerprint(text: String): String = {
    val norm = text.toLowerCase.replaceAll(" +", " ").trim
    java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def firstArrivals(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => fingerprint(d.text))
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, batch, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // within-batch duplicates: keep the smallest doc_id
            Iterator.single(batch.minBy(_.doc_id))
          }
      }
  }
}
