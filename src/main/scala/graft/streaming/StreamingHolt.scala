package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Live Holt linear smoothing — the streaming face of
  * [[graft.ops.SeriesStats.holt]] (α = β = 1/2 level+trend recursion,
  * forecast = level + trend) kept fresh over a live series feed: the
  * one-step-ahead forecast per key updates the moment a sealed row
  * arrives.
  *
  * The recursion depends only on the PAST, so every output is final on
  * arrival: no watermark, no sealing delay — `flatMapGroupsWithState` in
  * append mode with NoTimeout, O(1) state per key (two doubles + a
  * started flag). Because the state captures the recursion exactly, the
  * split-vs-whole law (fold a prefix, carry the state, fold the rest ==
  * fold everything) holds BIT-for-bit, and streaming output equals the
  * batch operator's on the same sealed rows — both are spec-gated.
  *
  * Ordering contract: same as [[StreamingAnomaly]] — rows may arrive
  * unordered WITHIN a micro-batch (sorted per key before folding), but
  * batches must not interleave time across boundaries (the upstream is a
  * sealed, in-order feed such as the tier-1 rollup sink).
  */
object StreamingHolt {

  final case class Smoothed(key: String, ts: Timestamp, x: Long,
      level: Double, trend: Double, forecast: Double)

  /** (level, trend) after the last folded row; `started` false = no rows yet. */
  final case class HoltState(started: Boolean, level: Double, trend: Double)

  final case class Row0(ts: Timestamp, x: Long,
      level: Double, trend: Double)

  /** Pure per-key fold — the identical IEEE op sequence as the batch
    * operator (SeriesStats.holt) and the q124 oracle's recursive CTE.
    */
  def fold(prior: HoltState, rows: Seq[(Timestamp, Long)])
      : (Seq[Row0], HoltState) = {
    var st = prior
    val out = rows.map { case (ts, x) =>
      st = if (!st.started) HoltState(started = true, x.toDouble, 0.0)
      else {
        val lNew = (x.toDouble + (st.level + st.trend)) / 2.0
        HoltState(started = true, lNew, ((lNew - st.level) + st.trend) / 2.0)
      }
      Row0(ts, x, st.level, st.trend)
    }
    (out, st)
  }

  /** Smooth a live series stream. Input columns: `keyCol` (cast to
    * string), `tsCol` timestamp, `valueCol` integral.
    */
  def smooth(input: DataFrame, keyCol: String, tsCol: String,
             valueCol: String): Dataset[Smoothed] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("long").as("x"))
      .as[(String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Long)],
         state: org.apache.spark.sql.streaming.GroupState[HoltState]) =>
          val prior = if (state.exists) state.get
            else HoltState(started = false, 0.0, 0.0)
          val batch = rows.map(r => (r._2, r._3)).toArray
            .sortBy(t => (t._1.getTime, t._1.getNanos))
          val (out, st) = fold(prior, batch.toSeq)
          state.update(st)
          out.iterator.map(r =>
            Smoothed(key, r.ts, r.x, r.level, r.trend, r.level + r.trend))
      }
  }
}
