package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Ingest

/** Structured Streaming tier-1 rollup — the streaming layer SURVEY.md §2.6
  * sketches (the reference itself is batch-incremental via status flags;
  * this is the engine-new path for live transcript feeds): tumbling 1-minute
  * windows with a watermark bounding transcript lateness, emitting the same
  * composable stats as the batch tier so late-arriving turns fold into the
  * cascade identically.
  *
  * Usage: pass `spark.readStream.schema(...).parquet(dir)` (or any source
  * with the transcript schema); write with `.writeStream.outputMode("append")`
  * after the watermark closes windows.
  */
object StreamingRollup {

  /** Per-(conv, 1m window) turn_rate/token_volume stats over a stream. */
  def tier1m(transcripts: DataFrame, lateness: String = "5 minutes"): DataFrame =
    transcripts
      .withWatermark("ts", lateness)
      .groupBy(col("conv_id"), window(col("ts"), "1 minute"))
      .agg(
        count(lit(1)).as("turn_rate"),
        sum(Ingest.tokenCount(col("text"))).cast("double").as("token_volume")
      )
      .select(
        col("conv_id"),
        col("window.start").as("chunk_start"),
        col("turn_rate").cast("double"),
        col("token_volume")
      )
}
