package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.CcRow
import graft.kernel.{Cc, Filter, Signal}

/** Canonical CC cleanup chain — the reference's postprocess
  * (/root/reference/xcorr/core/postprocess.py:21-150):
  * prune (status mask + lag window) BEFORE the heavy per-vector work, then
  * one fused kernel chain per row:
  * unbias → demean → taper → timeshift(−(pair_offset+time_offset)) →
  * highpass filtfilt → taper — executed as one typed mapPartitions stage
  * (no shuffle, no per-row Row/Seq boxing; the chain fuses exactly like the
  * reference's deferred whole-dataset pass, postprocess.py:133-141).
  *
  * Lag-axis discipline: rows carry `npts` (input length n) and `lag0`
  * (index of cc(0) on the full 2n−1 lag axis), so the chain composes with
  * lag-clipped tables (ProcessJob.Config.clipLagSec) — the axis is rebuilt
  * from metadata, never inferred from the array length
  * (↔ /root/reference/xcorr/core/init.py:197-209 index_min/index_max).
  */
object Postprocess {

  final case class Config(
      stepSec: Double = 60.0,           // grid delta (lag sampling interval)
      lagMinSec: Double = Double.NegativeInfinity, // global lag window
      lagMaxSec: Double = Double.PositiveInfinity,
      unbias: Boolean = true,
      taperSec: Double = 300.0,         // first taper length (ref: 5 s at 50 Hz)
      filterFreqHz: Double = 0.0,       // highpass corner in cycles/sec of lag
      filterOrder: Int = 2,
      taper2Sec: Double = 90.0,         // final taper (ref: 1.5 s)
      // celerity bounds for PER-PAIR lag windows (used with the
      // `pairDistance` table): pair lag window = [d/celerityMax,
      // d/celerityMin] intersected with the global window — the
      // reference's distance-derived mask, where distance is a pair-level
      // data variable, not a global scalar
      // (/root/reference/xcorr/scripts/timelapse.py:182-186 per-pair,
      // /root/reference/xcorr/core/postprocess.py:124-125 global-∩,
      // init.py:211-234 distance as a data variable; default velocity
      // (1460, 1500) m/s ↔ timelapse.py:367)
      celerityMin: Double = 1460.0,
      celerityMax: Double = 1500.0
  )

  // per-executor caches: the lag axis / unbias weights are static per
  // (n, delta) — one allocation per distinct window geometry, not per row
  private val lagCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, java.lang.Double), Array[Double]]()
  private[ops] def lagsFor(n: Int, delta: Double): Array[Double] =
    lagCache.computeIfAbsent((n, Double.box(delta)), _ => Cc.lagAxis(n, delta))
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()
  private def weightFor(n: Int): Array[Double] =
    weightCache.computeIfAbsent(n, k => Cc.weight(k))

  /** Apply to a CC table (CcRow columns). Rows with status != 1 are masked
    * out first (↔ cc.where(status==1), /root/reference/xcorr/io/read.py:90).
    * Output rows have the processed `cc` and an updated `lag0` reflecting
    * the lag-window slice.
    *
    * @param pairDistance optional per-pair feature table (pair, distance)
    *        — the reference's `distance(pair)` data variable (init.py:211-
    *        234). When given, each pair's lag window is the celerity mask
    *        `d/celerityMax <= lag <= d/celerityMin` intersected with the
    *        global [lagMinSec, lagMaxSec] (timelapse.py:182-186,
    *        postprocess.py:124-125); pairs missing from the table keep the
    *        global window. The table is broadcast (pair-level features are
    *        dimension-sized) — one narrow join, no extra exchange of the
    *        cc arrays.
    */
  def apply(cc: DataFrame, cfg: Config, pairDistance: Option[DataFrame] = None): DataFrame = {
    val spark = cc.sparkSession
    import spark.implicits._

    val withHash =
      if (cc.columns.contains("input_hash")) cc else cc.withColumn("input_hash", lit(""))
    val base = withHash.where(col("status") === 1)
      .select(col("pair"), col("metric"), col("win_start"), col("cc"),
        col("status").cast("tinyint").as("status"), col("pair_offset"), col("time_offset"),
        col("shift"), col("cc_max"), col("npts"), col("lag0"), col("input_hash"))
    val withWin = pairDistance match {
      case Some(pd) =>
        base
          .join(broadcast(pd.select(col("pair"),
            col("distance").cast("double").as("__d"))), Seq("pair"), "left")
          // greatest/least skip nulls, so a pair absent from the feature
          // table (null __d) falls back to the global window
          .withColumn("__lag_min", greatest(col("__d") / cfg.celerityMax, lit(cfg.lagMinSec)))
          .withColumn("__lag_max", least(col("__d") / cfg.celerityMin, lit(cfg.lagMaxSec)))
      case None =>
        base.withColumn("__lag_min", lit(cfg.lagMinSec)).withColumn("__lag_max", lit(cfg.lagMaxSec))
    }
    withWin
      .select(struct(
        col("pair"), col("metric"), col("win_start"), col("cc"), col("status"),
        col("pair_offset"), col("time_offset"), col("shift"), col("cc_max"),
        col("npts"), col("lag0"), col("input_hash")).as("r"),
        col("__lag_min"), col("__lag_max"))
      .as[(CcRow, Double, Double)]
      .mapPartitions { it =>
        it.map { case (r, lagMinSec, lagMaxSec) =>
          val n = r.npts
          val lags = lagsFor(n, cfg.stepSec)
          var x = r.cc.clone()
          val len = x.length
          // unbias weights (↔ signal/unbias.py:30-103; refuse-double-apply
          // is the caller's flag duty, mirrored by the config hash) —
          // sliced at lag0 so clipped tables get the right taper of weights
          if (cfg.unbias) {
            val w = weightFor(n)
            var i = 0
            while (i < len) { x(i) *= w(r.lag0 + i); i += 1 }
          }
          x = Signal.demean(x)
          val fs = 1.0 / cfg.stepSec
          x = Signal.taper(x, maxPercentage = 0.5, maxLength = math.max((cfg.taperSec * fs).toInt, 1))
          val delay = -(r.pair_offset + r.time_offset)
          if (delay != 0.0) {
            // the rfft fast path even-trims odd n (reference quirk,
            // timeshift.py:46-49,90-96); pad the dropped sample back so the
            // lag axis stays aligned for the masking below
            x = Signal.timeshift(x, delay, cfg.stepSec)
            if (x.length < len) x = java.util.Arrays.copyOf(x, len)
          }
          if (cfg.filterFreqHz > 0)
            x = Filter.highpassFiltFilt(x, cfg.filterFreqHz, fs, cfg.filterOrder)
          x = Signal.taper(x, maxPercentage = 0.5, maxLength = math.max((cfg.taper2Sec * fs).toInt, 1))
          // lag-window mask applied last; the in-window lags are contiguous
          // (monotone axis), so the mask is a slice [k0, k1]. Bounds are
          // per-ROW: the pair's celerity window when a distance table was
          // given, the global config window otherwise.
          var k0 = 0
          while (k0 < len && !(lags(r.lag0 + k0) >= lagMinSec && lags(r.lag0 + k0) <= lagMaxSec)) k0 += 1
          var k1 = len - 1
          while (k1 >= k0 && !(lags(r.lag0 + k1) >= lagMinSec && lags(r.lag0 + k1) <= lagMaxSec)) k1 -= 1
          val out =
            if (k1 < k0) new Array[Double](0)
            else if (k0 == 0 && k1 == len - 1) x
            else java.util.Arrays.copyOfRange(x, k0, k1 + 1)
          r.copy(cc = out, lag0 = r.lag0 + k0)
        }
      }
      .toDF()
  }

  /** SNR over a (possibly postprocessed, possibly lag-clipped) CC table
    * (↔ /root/reference/xcorr/signal/snr.py:27-168): noise = rms of the
    * noise lag band (always over the RAW cc, snr.py:108), signal = max of
    * |cc| — or of the amplitude envelope |hilbert(cc)| when `envelope`
    * (snr.py:110-112) — in the signal band, snr = s/n, plus the lag at the
    * signal max — one typed narrow pass, no shuffle.
    *
    * @param envelope locate the peak on the analytic-signal magnitude
    * @param power    report the ratio of powers: snr = (s/n)² (snr.py:120)
    * @param decibels report 20·log10(s/n) (snr.py:117-119; implies the
    *                 power convention, hence the factor 20)
    */
  def snr(
      cc: DataFrame,
      stepSec: Double,
      signalBand: (Double, Double),
      noiseBand: (Double, Double),
      envelope: Boolean = false,
      power: Boolean = false,
      decibels: Boolean = false
  ): DataFrame = {
    val spark = cc.sparkSession
    import spark.implicits._
    cc.select(col("pair"), col("metric"), col("win_start"), col("cc"),
        col("npts"), col("lag0"))
      .as[(String, String, Timestamp, Array[Double], Int, Int)]
      .mapPartitions { it =>
        it.map { case (pair, metric, winStart, arr, n, lag0) =>
          val lags = lagsFor(n, stepSec)
          val sig = if (envelope) Signal.envelope(arr) else arr
          var noiseSum = 0.0
          var noiseN = 0
          var sMax = 0.0
          var sLag = 0.0
          var i = 0
          while (i < arr.length) {
            val l = lags(lag0 + i)
            if (l >= noiseBand._1 && l <= noiseBand._2) { noiseSum += arr(i) * arr(i); noiseN += 1 }
            if (l >= signalBand._1 && l <= signalBand._2 && math.abs(sig(i)) > sMax) {
              sMax = math.abs(sig(i)); sLag = l
            }
            i += 1
          }
          val nRms = if (noiseN == 0) Double.NaN else math.sqrt(noiseSum / noiseN)
          val ratio = sMax / nRms
          val snrV =
            if (decibels) 20.0 * math.log10(ratio)
            else if (power) ratio * ratio
            else ratio
          (pair, metric, winStart, sMax, nRms, snrV, sLag)
        }
      }
      .toDF("pair", "metric", "win_start", "s", "n", "snr", "lag_s_max")
  }
}
