package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.{Cc, Filter, Signal}

/** Canonical CC cleanup chain — the reference's postprocess
  * (/root/reference/xcorr/core/postprocess.py:21-150):
  * prune (status mask + lag window) BEFORE the heavy per-vector work, then
  * one fused kernel chain per row:
  * unbias → demean → taper → timeshift(−(pair_offset+time_offset)) →
  * highpass filtfilt → taper — executed as a single `transform` over the
  * packed lag arrays inside one narrow mapPartitions stage (no shuffle;
  * the chain fuses exactly like the reference's deferred whole-dataset
  * pass, postprocess.py:133-141).
  */
object Postprocess {

  final case class Config(
      stepSec: Double = 60.0,           // grid delta (lag sampling interval)
      lagMinSec: Double = Double.NegativeInfinity, // celerity-style lag window
      lagMaxSec: Double = Double.PositiveInfinity,
      unbias: Boolean = true,
      taperSec: Double = 300.0,         // first taper length (ref: 5 s at 50 Hz)
      filterFreqHz: Double = 0.0,       // highpass corner in cycles/sec of lag
      filterOrder: Int = 2,
      taper2Sec: Double = 90.0          // final taper (ref: 1.5 s)
  )

  /** Apply to a CC table (pair, metric, win_start, cc, status, pair_offset,
    * time_offset, ...). Rows with status != 1 are masked out first
    * (↔ cc.where(status==1), /root/reference/xcorr/io/read.py:90).
    */
  def apply(cc: DataFrame, cfg: Config): DataFrame = {
    val spark = cc.sparkSession
    import spark.implicits._

    val pruned = cc.where(col("status") === 1)

    val kernelChain = udf { (ccArr: Seq[Double], pairOffset: Double, timeOffset: Double, n: Int) =>
      var x = ccArr.toArray
      val nn = x.length
      // lag axis for this row (static per (npts, delta) — cached by length
      // inside the kernel layer)
      val lags = Cc.lagAxis(n, cfg.stepSec)
      require(lags.length == nn, s"cc length $nn != lag axis ${lags.length}")
      // unbias weights (↔ signal/unbias.py:30-103; refuse-double-apply is
      // the caller's flag duty, mirrored by the config hash)
      if (cfg.unbias) {
        val w = Cc.weight(n)
        var i = 0
        while (i < nn) { x(i) *= w(i); i += 1 }
      }
      x = Signal.demean(x)
      val fs = 1.0 / cfg.stepSec
      val taperLen = math.max((cfg.taperSec * fs).toInt, 1)
      x = Signal.taper(x, maxPercentage = 0.5, maxLength = taperLen)
      val delay = -(pairOffset + timeOffset)
      if (delay != 0.0) {
        // the rfft fast path even-trims odd n (reference quirk,
        // timeshift.py:46-49,90-96); pad the dropped sample back so the
        // lag axis stays aligned for the masking below
        x = Signal.timeshift(x, delay, cfg.stepSec)
        if (x.length < nn) x = java.util.Arrays.copyOf(x, nn)
      }
      if (cfg.filterFreqHz > 0)
        x = Filter.highpassFiltFilt(x, cfg.filterFreqHz, fs, cfg.filterOrder)
      x = Signal.taper(x, maxPercentage = 0.5, maxLength = math.max((cfg.taper2Sec * fs).toInt, 1))
      // lag-window mask applied last (values outside → drop via slice)
      val keep = lags.indices.filter(i => lags(i) >= cfg.lagMinSec && lags(i) <= cfg.lagMaxSec)
      keep.map(x).toArray
    }

    // n (input vector length) from the stored cc length: nn = 2n-1
    pruned.withColumn("cc",
      kernelChain(col("cc"), col("pair_offset"), col("time_offset"),
        ((size(col("cc")) + 1) / 2).cast("int")))
  }

  /** SNR over a postprocessed CC table (↔ /root/reference/xcorr/signal/
    * snr.py:27-168): noise = rms of the masked noise lag band, signal = max
    * |cc| (or envelope) in the signal band, snr = s/n, plus the lag at the
    * signal max — one groupBy-free pass using array expressions.
    */
  def snr(
      cc: DataFrame,
      stepSec: Double,
      signalBand: (Double, Double),
      noiseBand: (Double, Double)
  ): DataFrame = {
    val computeSnr = udf { (arr: Seq[Double], n: Int) =>
      val lags = Cc.lagAxis(n, stepSec)
      var noiseSum = 0.0
      var noiseN = 0
      var sMax = 0.0
      var sLag = 0.0
      var i = 0
      while (i < arr.length) {
        val l = lags(i)
        if (l >= noiseBand._1 && l <= noiseBand._2) { noiseSum += arr(i) * arr(i); noiseN += 1 }
        if (l >= signalBand._1 && l <= signalBand._2 && math.abs(arr(i)) > sMax) {
          sMax = math.abs(arr(i)); sLag = l
        }
        i += 1
      }
      val nRms = if (noiseN == 0) Double.NaN else math.sqrt(noiseSum / noiseN)
      (sMax, nRms, sMax / nRms, sLag)
    }
    cc.withColumn("snr_t",
        computeSnr(col("cc"), ((size(col("cc")) + 1) / 2).cast("int")))
      .select(col("pair"), col("metric"), col("win_start"),
        col("snr_t._1").as("s"), col("snr_t._2").as("n"),
        col("snr_t._3").as("snr"), col("snr_t._4").as("lag_s_max"))
  }
}
