package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Coincidence trigger over a per-(key, time) characteristic function
  * (e.g. the snr table) — the reference's network coincidence trigger
  * re-expressed as gaps-and-islands window functions
  * (/root/reference/xcorr/signal/trigger.py:29-200: threshold-on over the
  * key dimension, coincidence sum, drop periods shorter than
  * `minDurationSteps`, optional ±extend, dense period index).
  */
object Trigger {

  /** @param cf   DataFrame(key, time, value) characteristic function
    * @param thrOn trigger when value > thrOn
    * @param coincidence minimum number of distinct keys simultaneously on
    * @param stepSec the regular time-grid step of `time`
    * @param minDurationSteps drop periods shorter than this many steps
    *                         (reference default 3·window_step,
    *                         trigger.py:96-99,166-168)
    * @param extendSteps widen each period by this many steps on both sides
    *                    (trigger.py extend semantics)
    * @return (period, period_start, period_end, n_steps) with `period` a
    *         dense 0-based index in time order (trigger.py:161-185 labels)
    */
  def periods(
      cf: DataFrame,
      thrOn: Double,
      coincidence: Int,
      stepSec: Long,
      minDurationSteps: Int = 3,
      extendSteps: Int = 0
  ): DataFrame = {
    val active = cf.where(col("value") > thrOn)
      .groupBy(col("time"))
      .agg(countDistinct(col("key")).as("n_on"))
      .where(col("n_on") >= coincidence)
    val w = Window.orderBy(col("time"))
    val islands = active
      .withColumn("grp",
        expr(s"unix_micros(cast(time as timestamp)) div ${stepSec * 1000000L}") - row_number().over(w))
      .groupBy(col("grp"))
      .agg(min(col("time")).as("period_start"), max(col("time")).as("period_end"),
        count(lit(1)).as("n_steps"))
      .where(col("n_steps") >= minDurationSteps)
    val extended =
      if (extendSteps == 0) islands
      else islands
        .withColumn("period_start", expr(s"period_start - interval ${extendSteps * stepSec} seconds"))
        .withColumn("period_end", expr(s"period_end + interval ${extendSteps * stepSec} seconds"))
    extended
      .withColumn("period", row_number().over(Window.orderBy(col("period_start"))) - 1)
      .select("period", "period_start", "period_end", "n_steps")
  }

  /** Join the period labels back onto the characteristic function
    * (trigger_values, /root/reference/xcorr/signal/trigger.py:203-266).
    */
  def values(cf: DataFrame, periodsDf: DataFrame): DataFrame =
    cf.join(periodsDf,
        col("time") >= col("period_start") && col("time") <= col("period_end"))
      .select(col("period"), col("key"), col("time"), col("value"))
}
