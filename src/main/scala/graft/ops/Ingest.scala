package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transcripts → gap-filled regular-grid series (SURVEY.md §2.2: the
  * `merge` + `interpolate` + `trim` preprocess semantics of the reference —
  * /root/reference/xcorr/stream/process.py:50-53 — re-expressed as a dense
  * `sequence()` grid left-join; the regular-spacing invariant the reference
  * asserts at /root/reference/xcorr/signal/correlate.py:314-318 holds by
  * construction).
  *
  * Scale notes: the heavy side is `bucketed` (one row per (conv, bucket)
  * after a map-side-combined groupBy); the `sequence` explode runs on the
  * tiny one-row-per-conv spans table; the fill join is an equi-join on
  * (conv_id, ts) which AQE handles. Rate/volume values are integral counts,
  * so every downstream double sum is order-independent exactly (< 2^53) —
  * that is what makes the rollup exact-match gate partitioning-invariant.
  */
object Ingest {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(split(trim(c), "\\s+")))

  /** Floor a timestamp onto a regular `stepSec` grid. */
  def bucket(ts: Column, stepSec: Long): Column =
    timestamp_seconds((unix_timestamp(ts) / stepSec).cast("long") * stepSec)

  /** Per-(conv, bucket) turn_rate and token_volume — the two metrics the
    * engine derives from transcripts (BASELINE.json north_star).
    */
  def bucketed(transcripts: DataFrame, stepSec: Long): DataFrame = {
    val b = timestamp_seconds((unix_timestamp(col("ts")) / stepSec).cast("long") * stepSec)
    transcripts
      .groupBy(col("conv_id"), b.as("ts"))
      .agg(
        count(lit(1)).cast("double").as("turn_rate"),
        sum(tokenCount(col("text"))).cast("double").as("token_volume")
      )
  }

  /** Gap-filled long-form series: (conv_id, metric, ts, value) with value=0
    * in empty buckets (rate metrics: an empty minute is a real zero).
    */
  def series(transcripts: DataFrame, stepSec: Long = 60L): DataFrame = {
    val b = bucketed(transcripts, stepSec)
    val spans = b.groupBy(col("conv_id")).agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val grid = spans.select(
      col("conv_id"),
      explode(expr(s"sequence(t0, t1, interval $stepSec seconds)")).as("ts")
    )
    grid
      .join(b, Seq("conv_id", "ts"), "left")
      .na.fill(0.0, Seq("turn_rate", "token_volume"))
      .selectExpr(
        "conv_id",
        "ts",
        "stack(2, 'turn_rate', turn_rate, 'token_volume', token_volume) as (metric, value)"
      )
      .select("conv_id", "metric", "ts", "value")
  }
}
