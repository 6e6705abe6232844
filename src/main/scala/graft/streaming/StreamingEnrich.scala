package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment — the streaming-scoring pattern: a stream
  * of events joined against the (static, periodically refreshed)
  * materialized feature vectors, producing model-ready rows online.
  *
  * The static side is broadcast per micro-batch when it fits (feature
  * vectors for the active entity universe), so the stream never
  * shuffles; Spark re-resolves the static relation each batch, which
  * is what makes "periodically re-materialized" snapshots visible to
  * a running query.
  */
object StreamingEnrich {

  /** events (streaming, with `entity_id`) ⋈ vectors (static). Events
    * for unknown entities keep flowing with null features when
    * `keepUnmatched`, else are dropped.
    */
  def enrich(events: DataFrame, vectors: DataFrame,
             keepUnmatched: Boolean = true): DataFrame = {
    val joinType = if (keepUnmatched) "left_outer" else "inner"
    events.join(broadcast(vectors), Seq("entity_id"), joinType)
  }
}
