package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Sketch

/** Live mergeable sketches — the streaming face of [[graft.ops.Sketch]]:
  * a per-window HyperLogLog register table over an event stream, the
  * streaming answer to "distinct users per day, live" that never holds
  * per-id state. State per open window is ≤ 2^p integer registers
  * (register max is a composable aggregate, so late-but-within-watermark
  * rows fold in exactly); sealed windows append once when the watermark
  * closes them, and the emitted rows are bit-identical to the batch
  * [[graft.ops.Sketch.hllRegistersBy]] over the same sealed data — the
  * same stream==batch discipline as StreamingRollup's tiers. Downstream,
  * sealed day sketches fold to month/total via
  * [[graft.ops.Sketch.foldRegisters]] with no raw-data revisit.
  */
object StreamingSketch {

  /** Per-(tumbling window, bucket) HLL registers over a stream. Output:
    * (day: window start, bucket, register) — the q96 surface, live.
    */
  def hllRegistersByWindow(events: DataFrame, tsCol: String, idCol: String,
      span: String = "1 day", p: Int = 8,
      lateness: String = "0 seconds"): DataFrame =
    // watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC so
    // the cast is a wall-clock identity
    Sketch.bucketRho(
        events.withColumn(tsCol, col(tsCol).cast("timestamp")), idCol, p, Seq(tsCol))
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), span), col("bucket"))
      .agg(max(col("rho")).as("register"))
      .select(col("window.start").as("day"), col("bucket"), col("register"))
}
