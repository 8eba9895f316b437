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

  /** Per-(tumbling window, cell) count-min grid over a stream — the q92
    * surface, live: count composes, so state per open window is ≤ d·16^wHex
    * integer cells and sealed windows equal the batch
    * [[graft.ops.Sketch.cmsCounts]] over the same sealed rows. Sealed day
    * grids fold to coarser tiers by per-cell SUM
    * ([[graft.ops.Sketch.cmsMerge]]).
    */
  def cmsByWindow(events: DataFrame, tsCol: String, itemCol: String,
      span: String = "1 day", d: Int = 4, wHex: Int = 2,
      lateness: String = "0 seconds"): DataFrame =
    events.withColumn(tsCol, col(tsCol).cast("timestamp"))
      .where(col(itemCol).isNotNull)
      .select(col(tsCol),
        explode(expr(Sketch.cellsExpr(d, s"cast($itemCol as string)", wHex))).as("__cell"))
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), span), col("__cell.r").as("cms_row"),
        col("__cell.c").as("cms_col"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("day"), col("cms_row"), col("cms_col"), col("cnt"))

  /** Per-(tumbling window, bin) equi-width histogram over a stream — the
    * q109 surface, live: counts compose, so state per open window is ≤
    * nBins integer cells, sealed windows equal the batch
    * [[graft.ops.Sketch.histByKey]] over the same sealed rows (spec-gated),
    * and sealed day tables fold to coarser tiers by per-bin SUM
    * ([[graft.ops.Sketch.histFold]] — the q110 law).
    */
  def histByWindow(events: DataFrame, tsCol: String, valCol: String,
      lo: Double, hi: Double, nBins: Int,
      span: String = "1 day", lateness: String = "0 seconds"): DataFrame = {
    events.withColumn(tsCol, col(tsCol).cast("timestamp"))
      .where(col(valCol).isNotNull)
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), span), Sketch.binExpr(valCol, lo, hi, nBins).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("day"), col("bin"), col("cnt"))
  }
}
