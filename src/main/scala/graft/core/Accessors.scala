package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import graft.ops.{Correlate, Ingest, Postprocess, Preprocess, Rollup}

/** Fluent accessor API — the Scala analog of the reference's xarray
  * accessors (`ds.xcorr.*` at /root/reference/xcorr/core/accessors.py:37-139
  * and `da.signal.*` at /root/reference/xcorr/signal/accessor.py:52-327):
  * extension methods that chain the engine's operators off any DataFrame of
  * the right shape.
  *
  * {{{
  * import graft.core.Accessors._
  * transcripts.xcorr.series(60)
  *   .xcorr.preprocess(Seq("demean" -> Map.empty))
  *   .xcorr.windows(3600, 1800, 60)
  *   .xcorr.ccPairs(pairs, 60, 3600)
  * }}}
  */
object Accessors {

  final class XcorrOps(private val df: DataFrame) {

    // ---- transcripts shape (conv_id, turn_idx, role, text, tool, ts)
    def series(stepSec: Long = 60): DataFrame = Ingest.series(df, stepSec)
    def seriesSparse(stepSec: Long = 60): DataFrame = Ingest.seriesSparse(df, stepSec)
    def bucketed(stepSec: Long = 60): DataFrame = Ingest.bucketed(df, stepSec)
    def tier1(stepSec: Long = 60, unit: String = "minute"): DataFrame =
      Rollup.tier1FromBuckets(Ingest.bucketed(df, stepSec), stepSec, unit)

    // ---- series shape (conv_id, metric, ts, value)
    def preprocess(ops: Seq[(String, Map[String, String])]): DataFrame =
      Preprocess(df, ops)
    def rollup(unit: String): DataFrame = Rollup.fromPoints(df, unit)
    def rollupCascade: (DataFrame, DataFrame, DataFrame) = Rollup.cascade(df)
    def toChunks(unit: String): DataFrame = Rollup.toChunks(df, unit)
    def lttb(threshold: Int, chunkUnit: String = "day"): DataFrame =
      Rollup.lttbTier(df, threshold, chunkUnit)
    /** NOTE dtype: window values are packed FLOAT32 (the reference's cc
      * dtype, init.py:84-85) — lossless for integral ingest counts but
      * ~1e-7 relative quantization on preprocessed (filtered/interpolated)
      * doubles. See Correlate.windows.
      */
    def windows(windowSec: Long, strideSec: Long, stepSec: Long): DataFrame =
      Correlate.windows(df, windowSec, strideSec, stepSec)
    def allPairs: DataFrame = Correlate.allPairs(df)

    // ---- characteristic-function shape (key, time, value)
    def triggerPeriods(thrOn: Double, coincidence: Int, stepSec: Long,
                       minDurationSteps: Int = 3, extendSteps: Int = 0): DataFrame =
      graft.ops.Trigger.periods(df, thrOn, coincidence, stepSec, minDurationSteps, extendSteps)
    def triggerValues(periodsDf: DataFrame, stepSec: Long): DataFrame =
      graft.ops.Trigger.values(df, periodsDf, stepSec)

    // ---- rollup shape (conv_id, metric, chunk_start, stats…)
    def rollupHigher(unit: String): DataFrame = Rollup.fromLower(df, unit)
    def fromChunks: DataFrame = Rollup.fromChunks(df)

    // ---- any keyed event shape (keys…, ts)
    def asofJoin(right: DataFrame, keys: Seq[String], leftTs: String,
                 rightTs: String, pick: Seq[String],
                 toleranceSec: Option[Long] = None): DataFrame =
      graft.ops.AsofJoin.leftAsof(df, right, keys, leftTs, rightTs, pick, toleranceSec)
    /** Hot-key as-of: (key, time-bucket) partitioned carry-forward. */
    def asofJoinBucketed(right: DataFrame, keys: Seq[String], leftTs: String,
                         rightTs: String, pick: Seq[String], bucketSec: Long,
                         toleranceSec: Option[Long] = None): DataFrame =
      graft.ops.AsofJoin.leftAsofBucketed(df, right, keys, leftTs, rightTs,
        pick, bucketSec, toleranceSec)

    // ---- windows shape (conv_id, metric, win_start, values)
    def ccPairs(pairs: DataFrame, stepSec: Long, windowSec: Long,
                normalize: Boolean = true, clipLagSec: Double = -1): Dataset[CcRow] =
      Correlate.ccPairs(df, pairs, stepSec, windowSec, normalize, unbiased = false, clipLagSec)

    // ---- documents shape (doc_id, text)
    def dedupExact(idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      graft.ops.Dedup.exact(df, idCol, textCol)
    def ngramJaccard(idCol: String = "doc_id", textCol: String = "text",
                     n: Int = 3, minJaccard: Double = 0.2, dfCap: Int = 100): DataFrame =
      graft.ops.Dedup.ngramJaccard(df, idCol, textCol, n, minJaccard, dfCap)
    def minhashCandidates(idCol: String = "doc_id", textCol: String = "text",
                          n: Int = 3, nHashes: Int = 8, rowsPerBand: Int = 2): DataFrame =
      graft.ops.Dedup.minhashLshCandidates(df, idCol, textCol, n, nHashes, rowsPerBand)
    def simhash(idCol: String = "doc_id", textCol: String = "text", bits: Int = 64): DataFrame =
      graft.ops.Dedup.simhash(df, idCol, textCol, bits)

    // ---- embeddings shape (vec_id, embedding)
    def cosineTopK(queryIds: Seq[Long], k: Int): DataFrame =
      graft.ops.Similarity.cosineTopK(df, queryIds, k)
    def lshBuckets(nPlanes: Int = 8, dim: Int = 64): DataFrame =
      graft.ops.Similarity.lshBuckets(df, nPlanes, dim)
    def cosineNearDup(minCosine: Double, nPlanes: Int = 8, dim: Int = 64): DataFrame =
      graft.ops.Similarity.cosineNearDup(df, minCosine, nPlanes, dim)
    def ivfTopK(queryIds: Seq[Long], k: Int, nCentroids: Int = 8, nProbe: Int = 2): DataFrame =
      graft.ops.Similarity.ivfTopK(df, queryIds, k, nCentroids, nProbe)

    // ---- cc shape (pair, metric, win_start, cc, status, offsets…)
    def postprocess(cfg: Postprocess.Config,
                    pairDistance: Option[DataFrame] = None): DataFrame =
      Postprocess(df, cfg, pairDistance)
    def snr(stepSec: Double, signalBand: (Double, Double), noiseBand: (Double, Double),
            envelope: Boolean = false, power: Boolean = false,
            decibels: Boolean = false): DataFrame =
      Postprocess.snr(df, stepSec, signalBand, noiseBand, envelope, power, decibels)
  }

  implicit final class XcorrDataFrame(private val df: Dataset[_]) {
    def xcorr: XcorrOps = new XcorrOps(df.toDF())
  }

  /** Column-level signal functions (the `da.signal.*` analog). */
  object functions {
    def token_count(c: Column): Column = graft.functions.TokenCount(c)
  }
}
