package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.meta.Hasher

/** Declarative per-metric preprocessing registry — the Spark re-expression
  * of the reference's operation registry + generic evaluator
  * (/root/reference/xcorr/stream/process.py:29-94 registry,
  * 199-297 apply_operation, 300-412 process fold, 557-614 JSON+sha256).
  *
  * A config is an ordered list of (opName, params) applied per metric; it
  * JSON-serializes canonically and sha256-hashes so jobs can revalidate
  * that stored data was produced by the same preprocessing — exactly the
  * reference's hash-gated reuse (process.py:569-586,
  * /root/reference/xcorr/core/process.py:68-73).
  *
  * Each op is a DataFrame→DataFrame stage over the long-form series schema
  * (conv_id, metric, ts, value); all are built-in-Catalyst expressions
  * (window functions / aggregates), no UDFs.
  */
object Preprocess {

  type Op = (DataFrame, Map[String, String]) => DataFrame

  private def keyWindow = Window.partitionBy(col("conv_id"), col("metric"))
  private def orderedKeyWindow = keyWindow.orderBy(col("ts"))

  /** Registry (↔ process.py:29-94). Op semantics map per SURVEY.md §2.2. */
  val registry: Map[String, Op] = Map(
    // subtract the per-key mean (↔ obspy detrend 'demean')
    "demean" -> ((df, _) =>
      df.withColumn("value", col("value") - avg(col("value")).over(keyWindow))),
    // remove the per-key least-squares linear trend (detrend 'linear');
    // closed-form via the regr_* aggregates — two passes fused by Catalyst
    "detrend" -> ((df, _) => {
      val t = unix_micros(col("ts").cast("timestamp")).cast("double") / 1e6
      df.withColumn("slope", expr("regr_slope(value, cast(unix_micros(cast(ts as timestamp)) as double) / 1e6)").over(keyWindow))
        .withColumn("icept", expr("regr_intercept(value, cast(unix_micros(cast(ts as timestamp)) as double) / 1e6)").over(keyWindow))
        .withColumn("value", col("value") - (col("slope") * t + col("icept")))
        .drop("slope", "icept")
    }),
    // scale to max |amplitude| (↔ normalize op)
    "normalize" -> ((df, _) => {
      val m = max(abs(col("value"))).over(keyWindow)
      df.withColumn("value", when(m === 0, col("value")).otherwise(col("value") / m))
    }),
    // keep [starttime, endtime) (↔ trim, params injected like the
    // reference's dynamic starttime/endtime injection process.py:153-196)
    "trim" -> ((df, p) =>
      df.where(col("ts") >= lit(p("starttime")).cast("timestamp_ntz") &&
        col("ts") < lit(p("endtime")).cast("timestamp_ntz"))),
    // metric subset (↔ select channel)
    "select" -> ((df, p) => df.where(col("metric") === p("metric"))),
    // non-overlapping windowed RMS, re-rates the series to 1/window
    // (↔ running_rms, /root/reference/xcorr/stream/running_rms.py:19-115)
    "running_rms" -> ((df, p) => {
      val w = p.getOrElse("window", "3600").toLong
      df.groupBy(col("conv_id"), col("metric"),
          expr(s"timestamp_seconds((unix_micros(cast(ts as timestamp)) div ${w * 1000000L}) * $w)").as("ts"))
        .agg(sqrt(avg(col("value") * col("value"))).as("value"))
    }),
    // decimate: keep every k-th grid point per key (AA filtering is the
    // caller's job via a prior kernel stage, as in the reference)
    "decimate" -> ((df, p) => {
      val k = p.getOrElse("factor", "2").toInt
      df.withColumn("rn", row_number().over(orderedKeyWindow) - 1)
        .where(pmod(col("rn"), lit(k)) === 0)
        .drop("rn")
    }),
    // clip values into [min, max]
    "clip" -> ((df, p) => {
      val lo = p.getOrElse("min", "-Infinity").toDouble
      val hi = p.getOrElse("max", "Infinity").toDouble
      df.withColumn("value", least(greatest(col("value"), lit(lo)), lit(hi)))
    }),
    // |x|
    "absolute" -> ((df, _) => df.withColumn("value", abs(col("value"))))
  )

  /** Fold an op list over the series (↔ process.py:300-412). Unknown ops
    * fail fast, mirroring the reference's registry check (process.py:237).
    */
  def apply(series: DataFrame, ops: Seq[(String, Map[String, String])]): DataFrame =
    ops.foldLeft(series) { case (df, (name, params)) =>
      val op = registry.getOrElse(name,
        throw new IllegalArgumentException(s"unknown preprocess operation '$name'"))
      op(df, params)
    }

  /** Canonical sha256 of the op list (↔ hash_operations,
    * process.py:557-566) — stored in manifests / table properties and
    * revalidated before reusing materialized series.
    */
  def hashOps(ops: Seq[(String, Map[String, String])]): String =
    Hasher.hashObj(ops.map { case (n, p) => Map("op" -> n, "params" -> p) })
}
