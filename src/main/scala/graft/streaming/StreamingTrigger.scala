package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming coincidence-trigger sessionizer — the live counterpart of
  * `ops.Trigger.periods` (gaps-and-islands over an active-steps stream),
  * built on `flatMapGroupsWithState` with an EVENT-TIME timeout:
  *
  *  - state = the set of still-open islands (contiguous runs of active
  *    grid steps);
  *  - a new step extends an adjacent island, bridges two, or opens one;
  *  - an island is emitted exactly once, when the watermark proves no
  *    late event can extend it (end + step < watermark), and only if it
  *    lasted >= minDurationSteps (trigger.py:96-99 drop semantics).
  *
  * Scale note: the input here is the POST-coincidence active-steps stream
  * (one row per grid step that crossed the threshold), which is
  * output-sized, not event-sized — so the single logical state group is a
  * deliberate choice, mirroring the batch operator's output-bounded stitch
  * pass. The heavy per-event aggregation (threshold + distinct-key count
  * per window) runs upstream as a normal watermark'd streaming aggregation.
  */
object StreamingTrigger {

  final case class Island(period_start: Timestamp, period_end: Timestamp, n_steps: Long)

  // open islands as (startUs, endUs) of occupied grid steps
  final case class OpenIslands(spans: List[(Long, Long)])

  /** Sessionize a stream of active steps (columns: time, n_on — already
    * thresholded/coincidence-filtered). `lateness` bounds event lateness
    * (the watermark); emitted rows are final.
    */
  def sessionize(
      activeSteps: DataFrame,
      stepSec: Long,
      minDurationSteps: Int = 3,
      lateness: String = "0 seconds"
  ): Dataset[Island] = {
    val spark = activeSteps.sparkSession
    import spark.implicits._
    val stepUs = stepSec * 1000000L

    def toUs(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    def toTs(us: Long): Timestamp = new Timestamp(us / 1000L)

    val fn = (_: Int, rows: Iterator[(Timestamp, Long)], state: GroupState[OpenIslands]) => {
      val prior = if (state.exists) state.get.spans else Nil
      // merge the batch's steps into the open-island set
      val steps = rows.map(r => (toUs(r._1) / stepUs) * stepUs).toArray.sorted.distinct
      var spans = prior
      steps.foreach { s =>
        val (left, rest0) = spans.partition { case (_, e) => e + stepUs == s }
        val (right, rest) = rest0.partition { case (b, _) => b - stepUs == s }
        spans = (left, right) match {
          case (Nil, Nil) =>
            // duplicate step inside an existing span: no-op
            if (rest.exists { case (b, e) => s >= b && s <= e }) rest else (s, s) :: rest
          case (l :: _, Nil)    => (l._1, s) :: rest
          case (Nil, r :: _)    => (s, r._2) :: rest
          case (l :: _, r :: _) => (l._1, r._2) :: rest // the step bridges two islands
        }
      }
      // close islands the watermark has sealed (no event with time >= wm
      // can be adjacent anymore)
      val wm = state.getCurrentWatermarkMs() * 1000L
      val (closed, open) = spans.partition { case (_, e) => e + stepUs < wm }
      if (open.isEmpty) state.remove()
      else {
        state.update(OpenIslands(open))
        // wake up when the watermark passes the earliest possible close
        state.setTimeoutTimestamp((open.map(_._2).min + stepUs) / 1000L + 1L)
      }
      closed.sortBy(_._1).iterator
        .map { case (b, e) => Island(toTs(b), toTs(e), (e - b) / stepUs + 1) }
        .filter(_.n_steps >= minDurationSteps)
    }

    activeSteps
      .select(col("time").cast("timestamp").as("time"), col("n_on").cast("long").as("n_on"))
      .withWatermark("time", lateness) // AFTER the cast projection, so the watermark tag survives
      .as[(Timestamp, Long)]
      .groupByKey(_ => 0) // post-coincidence stream is output-sized (see scale note)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** The upstream coincidence aggregation as a streaming stage: rows
    * (key, time, value) → active steps (time, n_on) with n_on >= the
    * coincidence count among values above the threshold — the streaming
    * form of the batch operator's first aggregation.
    */
  def activeSteps(
      cf: DataFrame,
      thrOn: Double,
      coincidence: Int,
      stepSec: Long,
      lateness: String = "0 seconds"
  ): DataFrame =
    cf.where(col("value") > thrOn)
      .withWatermark("time", lateness)
      .groupBy(window(col("time"), s"$stepSec seconds").as("w"))
      .agg(size(collect_set(col("key"))).cast("long").as("n_on"))
      .where(col("n_on") >= coincidence)
      .select(col("w.start").as("time"), col("n_on"))
}
