package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming exact dedup — the streaming face of
  * graft.ops.Dedup.exact for live document feeds: the FIRST occurrence of
  * each content hash passes, later duplicates are dropped.
  *
  * State discipline at scale: `dropDuplicatesWithinWatermark` keeps a key in
  * the state store only until the watermark passes its event time, so state
  * is bounded by (dedup horizon × arrival rate), not by corpus size — the
  * property that makes exact dedup runnable as a continuous job over an
  * unbounded feed. Exact-forever dedup of a bounded corpus belongs to the
  * batch operator (hash groupBy, Dedup.exact).
  */
object StreamingDedup {

  /** Distinct documents by md5(text) within a `horizon` of event time.
    *
    * @param docs    streaming DataFrame with `tsCol` (event time) and
    *                `textCol`
    * @param horizon how far apart two arrivals must be before a repeat of
    *                the same content is considered new again (also bounds
    *                the state store)
    */
  def distinctDocs(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      horizon: String = "10 minutes"
  ): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
