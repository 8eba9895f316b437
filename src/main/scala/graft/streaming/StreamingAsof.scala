package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the continuous face of `graft.ops.AsofJoin`:
  * every left event is emitted once, enriched with the LATEST right value
  * at-or-before its event time, as soon as the watermark guarantees no
  * earlier right row can still arrive.
  *
  * Correctness discipline: a left row at `lts` is sealed only when the
  * watermark passes `lts` — at that point every right row with
  * `rts <= lts` is final (watermark contract), so the match equals the
  * batch operator's on the same data (asserted in IoStreamingSpec).
  *
  * State discipline at scale (per key):
  *  - unsealed left rows: bounded by watermark lag × arrival rate;
  *  - right rows newer than the carry: same bound;
  *  - ONE carried (ts, value) — the latest sealed right — which is what
  *    makes unbounded-horizon as-of possible in O(1) per key. With a match
  *    `toleranceSec`, a carry older than the tolerance is dropped and the
  *    whole key's state disappears once quiet — full GC for dead keys.
  *
  * Right-side ties (two rights at one key+ts) resolve arbitrarily, as in
  * the batch operator without `tiebreak` columns — pre-dedupe the right
  * feed for full determinism.
  */
object StreamingAsof {

  /** buffered rows + the carried latest sealed right */
  final case class AsofState(
      lefts: List[(Long, Long)],            // (ts micros, event id)
      rights: List[(Long, Double)],         // (ts micros, value), unsealed
      carry: Option[(Long, Double)])

  final case class AsofOut(
      key: String, event_id: Long, ts: Timestamp,
      ref_value: Option[Double], asof_ts: Option[Timestamp])

  /** @param left   streaming (key, ts, event_id)
    * @param right  streaming (key, ts, ref_value)
    * @param lateness     watermark on both feeds
    * @param toleranceSec match only if left.ts - right.ts <= tolerance;
    *                     also enables carry GC
    */
  def leftAsof(
      left: DataFrame, right: DataFrame,
      lateness: String = "0 seconds",
      toleranceSec: Option[Long] = None
  ): Dataset[AsofOut] = {
    val spark = left.sparkSession
    import spark.implicits._

    // tag-union the two sides (the batch operator's shape, streamed);
    // the watermarked ts column must reach the stateful operator's input
    val l = left.withWatermark("ts", lateness)
      .select(col("key"), col("ts"), lit(0).as("side"),
        col("event_id").cast("long").as("id"), lit(0.0).as("v"))
    val r = right.withWatermark("ts", lateness)
      .select(col("key"), col("ts"), lit(1).as("side"),
        lit(0L).as("id"), col("ref_value").cast("double").as("v"))
    val tagged = l.unionByName(r)
      .as[(String, Timestamp, Int, Long, Double)]

    val tolUs = toleranceSec.map(_ * 1000000L)

    // full microsecond precision: Timestamp.getTime truncates to millis,
    // the sub-ms part lives in getNanos
    def toUs(ts: Timestamp): Long = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    def fromUs(us: Long): Timestamp = {
      val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def matchLeft(lts: Long, rights: List[(Long, Double)], carry: Option[(Long, Double)]):
        (Option[Double], Option[Long]) = {
      val cands = rights.filter(_._1 <= lts) ++ carry.filter(_._1 <= lts)
      if (cands.isEmpty) (None, None)
      else {
        val (rts, v) = cands.maxBy(_._1)
        tolUs match {
          case Some(t) if lts - rts > t => (None, None)
          case _ => (Some(v), Some(rts))
        }
      }
    }

    val fn = (key: String,
              rows: Iterator[(String, Timestamp, Int, Long, Double)],
              state: GroupState[AsofState]) => {
      val st0 = if (state.exists) state.get else AsofState(Nil, Nil, None)
      var lefts = st0.lefts
      var rights = st0.rights
      var carry = st0.carry
      rows.foreach {
        case (_, ts, 0, id, _) => lefts = (toUs(ts), id) :: lefts
        case (_, ts, _, _, v)  => rights = (toUs(ts), v) :: rights
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L

      // seal: emit lefts the watermark has STRICTLY passed (a row exactly
      // at the watermark is not yet late — an equal-ts right could still
      // arrive), oldest first
      val (ripe, pending) = lefts.partition(_._1 < wmUs)
      val out = ripe.sortBy(l => (l._1, l._2)).map { case (lts, id) =>
        val (v, rts) = matchLeft(lts, rights, carry)
        AsofOut(key, id, fromUs(lts), v, rts.map(fromUs))
      }

      // carry forward the newest sealed right; keep unsealed rights
      val (sealedR, pendingR) = rights.partition(_._1 < wmUs)
      if (sealedR.nonEmpty) {
        val best = sealedR.maxBy(_._1)
        if (carry.forall(_._1 <= best._1)) carry = Some(best)
      }
      val carryAlive = carry.filter(c => tolUs.forall(t => wmUs - c._1 <= t))

      if (pending.isEmpty && pendingR.isEmpty && carryAlive.isEmpty) {
        if (state.exists) state.remove()
      } else {
        state.update(AsofState(pending, pendingR, carryAlive))
        // re-arm: fire when the watermark passes the oldest pending row
        // (or, with a tolerance, when the carry expires)
        val next = (pending.map(_._1) ++ pendingR.map(_._1) ++
          carryAlive.flatMap(c => tolUs.map(t => c._1 + t)).toList).minOption
        next.foreach(us => state.setTimeoutTimestamp(
          math.max(us / 1000L + 1L, state.getCurrentWatermarkMs() + 1L)))
      }
      out.iterator
    }

    tagged
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
