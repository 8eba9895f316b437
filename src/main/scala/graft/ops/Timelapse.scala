package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.{Signal, Signal2d}

/** Second-order timelapse analysis — the Spark re-expression of the
  * reference's `xcorr-timelapse` pipeline
  * (/root/reference/xcorr/scripts/timelapse.py:477-736):
  * per-(key, window) spectrograms, then the (time1 × time2) matrix of 2-D
  * cross-correlations computed ONLY for the lower triangle (tri_mask,
  * /root/reference/xcorr/signal/tri.py:19-55) and mirrored to the upper
  * half with the delta signs flipped (tri.py:58-115,
  * timelapse.py:348-362) — the "compute half, mirror the rest"
  * optimization, here a theta self-join `time1 < time2` + a union of the
  * swapped copy (no second kernel pass).
  */
object Timelapse {

  /** Per-(conv_id/pair key, metric, win_start) PSD spectrograms from the
    * windows table (values arrays): nperseg/hop sliding FFT
    * (↔ /root/reference/xcorr/signal/spectrogram.py:200-335 hop>=1 variant).
    * Output: (key, metric, win_start, spec: flat row-major array,
    * n_seg, n_freq).
    */
  def spectrograms(
      wins: DataFrame,
      stepSec: Double,
      npersegSamples: Int,
      hopSamples: Int
  ): DataFrame = {
    val spark = wins.sparkSession
    import spark.implicits._
    val fs = 1.0 / stepSec
    wins.select(col("conv_id"), col("metric"), col("win_start"),
        col("values").cast("array<double>").as("values"))
      .as[(String, String, Timestamp, Array[Double])]
      .mapPartitions { it =>
        it.map { case (key, metric, winStart, values) =>
          val (psd, _) = Signal.spectrogram(values, fs, npersegSamples, hopSamples)
          val nSeg = psd.length
          val nFreq = if (nSeg == 0) 0 else psd(0).length
          (key, metric, winStart, psd.flatten, nSeg, nFreq)
        }
      }
      .toDF("conv_id", "metric", "win_start", "spec", "n_seg", "n_freq")
  }

  /** The (time1 × time2) correlation matrix over one key's spectrograms:
    * lower triangle (win1 < win2) computed with the 2-D CC kernel, upper
    * triangle mirrored with negated deltas. Output columns:
    * (conv_id, metric, time1, time2, cc2_max, delta_seg, delta_freq).
    */
  def matrix(specs: DataFrame, stepSec: Double): DataFrame = {
    val spark = specs.sparkSession
    import spark.implicits._
    val a = specs.as("a")
    val b = specs.as("b")
    val lower = a
      .join(b,
        col("a.conv_id") === col("b.conv_id") && col("a.metric") === col("b.metric") &&
          col("a.win_start") < col("b.win_start") &&
          col("a.n_seg") === col("b.n_seg") && col("a.n_freq") === col("b.n_freq"))
      .select(
        col("a.conv_id").as("conv_id"), col("a.metric").as("metric"),
        col("a.win_start").as("time1"), col("b.win_start").as("time2"),
        col("a.spec").as("s1"), col("b.spec").as("s2"),
        col("a.n_seg").as("n_seg"), col("a.n_freq").as("n_freq"))
      // spread the kernel work over both time axes (tri-join output is
      // keyed by window pairs — hash both to avoid per-key pileup)
      .repartition(col("conv_id"), col("time1"), col("time2"))
      .as[(String, String, Timestamp, Timestamp, Array[Double], Array[Double], Int, Int)]
      .mapPartitions { it =>
        it.map { case (key, metric, t1, t2, s1, s2, nSeg, nFreq) =>
          def unflat(f: Array[Double]) = Array.tabulate(nSeg, nFreq)((i, j) => f(i * nFreq + j))
          val rxy = Signal2d.cc2d(unflat(s1), unflat(s2), normalize = true)
          val (d1, d2, mx) = Signal2d.extractShift2d(rxy)
          (key, metric, t1, t2, mx, d1, d2)
        }
      }
      .toDF("conv_id", "metric", "time1", "time2", "cc2_max", "delta_seg", "delta_freq")
    // mirror: swap times, flip delta signs (tri_mirror semantics)
    val upper = lower.select(
      col("conv_id"), col("metric"),
      col("time2").as("time1"), col("time1").as("time2"),
      col("cc2_max"), (-col("delta_seg")).as("delta_seg"), (-col("delta_freq")).as("delta_freq"))
    lower.unionByName(upper)
  }
}
