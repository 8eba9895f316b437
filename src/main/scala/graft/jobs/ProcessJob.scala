package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.ManifestRow
import graft.meta.{Cf19, Hasher, TableFormat}
import graft.ops.{Correlate, Ingest}

/** Checkpoint-resumable CC production job — the Spark re-expression of the
  * reference driver loop (/root/reference/xcorr/core/process.py:23-185 and
  * lazy orchestration /root/reference/xcorr/core/lazy.py:26-82):
  *
  *  - work item  = (pair, metric, win_start) ↔ the reference's (pair, time)
  *    cell with status flags {-1 missing, 0 todo, 1 done}
  *    (/root/reference/xcorr/core/init.py:237-249);
  *  - availability pre-gating (↔ lazy.py:128-177): the work list is built
  *    from the cheap spans-only `Correlate.candidates` query — no window
  *    arrays are assembled to decide what to do; only the conversations
  *    that still have pending cells pay for window assembly;
  *  - "skip already processed" = LEFT ANTI join of the work list against
  *    the manifest (process.py:93-104's `status != 0` skip — Spark has no
  *    cross-run memo, so the manifest table IS the memo, SURVEY.md §4),
  *    with per-key status resolved LATEST-WINS so a `retry_missing` run
  *    that upgrades a cell from -1 to 1 is never shadowed by the old row;
  *  - results append-write, manifest rows written AFTER data (write-after-
  *    data ordering): a crash between the two re-computes a deterministic
  *    result; `readCc` collapses duplicates freshest-wins (highest status —
  *    equal-status duplicates are bit-identical recomputes);
  *  - per-partition lineage + metrics land in the manifest rows, and the
  *    job config hash is revalidated like the reference's preprocess hash
  *    gate (/root/reference/xcorr/core/process.py:68-73).
  *
  * All filesystem probes go through Hadoop `FileSystem`, so manifests and
  * snapshots work on cluster storage (HDFS/S3), not only local disk.
  */
object ProcessJob {

  final case class Config(
      stepSec: Long = 60,
      windowSec: Long = 3600,
      strideSec: Long = 3600,
      normalize: Boolean = true,
      clipLagSec: Double = -1,
      // per-cell sha256 of the input windows, stored on each cc row
      // (↔ reference `hash` var, init.py:252-272 — costly, off by default)
      hashInputs: Boolean = false
  ) {
    def hash: String = Hasher.hashObj(Map(
      "stepSec" -> stepSec, "windowSec" -> windowSec, "strideSec" -> strideSec,
      "normalize" -> normalize, "clipLagSec" -> clipLagSec,
      "hashInputs" -> hashInputs))
  }

  final case class Stats(total: Long, pending: Long, written: Long)

  private def manifestPath(outDir: String) = s"$outDir/_manifest"
  private def dataPath(outDir: String) = s"$outDir/data"

  /** True if the directory (recursively) holds at least one parquet part —
    * an existing-but-empty dir (e.g. created by a crashed write) must read
    * as an empty table, not an inference error. Hadoop FileSystem, so any
    * scheme the cluster mounts (file:, hdfs:, s3a:) works.
    */
  private def hasParquet(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return false
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) return true
    }
    false
  }

  def readManifest(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val p = manifestPath(outDir)
    if (hasParquet(spark, p)) spark.read.parquet(p)
    else spark.emptyDataset[ManifestRow].toDF()
  }

  /** Completed CC table with freshest-wins duplicate collapse: the row with
    * the highest status per key wins (a retry upgrades -1 → 1; equal-status
    * duplicates are bit-identical deterministic recomputes, so any of them
    * is exact).
    */
  def readCc(spark: SparkSession, outDir: String): DataFrame = {
    val p = dataPath(outDir)
    if (!hasParquet(spark, p)) return spark.emptyDataFrame
    val w = Window.partitionBy(col("pair"), col("metric"), col("win_start"))
      .orderBy(col("status").desc)
    spark.read.parquet(p)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Run (or resume) the job. `maxWindows` > 0 processes only that many
    * work items this invocation — used by the resume tests to simulate a
    * partial run / crash.
    *
    * @param retryMissing re-process cells previously flagged -1
    *                     (missing_data), mirroring the reference's
    *                     `retry_missing` (process.py:93-104)
    */
  def run(
      spark: SparkSession,
      transcripts: DataFrame,
      pairs: DataFrame,
      outDir: String,
      cfg: Config = Config(),
      maxWindows: Int = -1,
      retryMissing: Boolean = false
  ): Stats = {
    val jobId = s"ccjob-${cfg.hash.take(12)}"

    // one materialization of the series feeds BOTH the work-list planning
    // and (filtered) the window assembly — round 1 recomputed the whole
    // ingest lineage once per consumer. The SPARSE form (occupied buckets
    // only) is sufficient and exact for windowed CC: the window assembly
    // reconstructs zeros and spans are gap-fill-invariant (OpsSpec asserts
    // bitwise equality of the two forms' windows).
    val series = Ingest.seriesSparse(transcripts, cfg.stepSec)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // availability pre-gate: complete-window candidates from spans only
    val cand = Correlate.candidates(series, cfg.windowSec, cfg.strideSec, cfg.stepSec)
      .select(col("conv_id"), col("metric"),
        timestamp_seconds(col("win_start_s")).as("win_start"))

    // full work list: every (pair, metric, win_start) where both sides have
    // a complete window
    val a = cand.select(col("conv_id").as("conv_a"), col("metric"), col("win_start"))
    val b = cand.select(col("conv_id").as("conv_b"), col("metric"), col("win_start"))
    val work = a
      .join(broadcast(pairs), Seq("conv_a"))
      .join(b, Seq("conv_b", "metric", "win_start"))
      .select(
        concat_ws("|", col("metric"),
          concat(col("conv_a"), lit("-"), col("conv_b")),
          unix_timestamp(col("win_start"))).as("partition_key"),
        col("conv_a"), col("conv_b"), col("metric"), col("win_start")
      )

    // skip cells already processed (status=1) and — unless retrying —
    // cells flagged missing_data (status=-1), exactly the reference's
    // status-flag skip (process.py:93-104). Status per key is the LATEST
    // manifest row's: a retry that appended 1 after -1 must read as 1.
    val doneStatuses = if (retryMissing) Seq(1) else Seq(1, -1)
    val done = readManifest(spark, outDir)
      .where(col("job_id") === jobId)
      .groupBy(col("partition_key"))
      .agg(max_by(col("status"), col("finished_ts")).as("status"))
      .where(col("status").isin(doneStatuses: _*))
      .select(col("partition_key"))

    var pending = work.join(done, Seq("partition_key"), "left_anti")
    if (maxWindows > 0) pending = pending.limit(maxWindows)
    pending = pending.cache()
    val nPending = pending.count()
    val nTotal = work.count()

    if (nPending > 0) {
      val pendingPairs = pending.select(col("conv_a"), col("conv_b")).distinct()
      val pendingKeys = pending.select("partition_key")
      // assemble window arrays ONLY for conversations that still have work
      val pendingConvs = pending.select(col("conv_a").as("conv_id"))
        .union(pending.select(col("conv_b").as("conv_id"))).distinct()
      val pendingSeries = series.join(broadcast(pendingConvs), Seq("conv_id"), "left_semi")
      // two-step assembly (windows once per conv, then pair tagging): at
      // production pair fanout this beats the fused ccPairsSparse shape,
      // whose point agg grows with points×fanout (measured head-to-head —
      // see Correlate.ccPairsSparse scaladoc)
      val wins = Correlate.windows(pendingSeries, cfg.windowSec, cfg.strideSec, cfg.stepSec)
      val cc = Correlate
        .ccPairs(wins, pendingPairs, cfg.stepSec, cfg.windowSec, cfg.normalize,
          unbiased = false, clipLagSec = cfg.clipLagSec, hashInputs = cfg.hashInputs)
        .toDF()
        .withColumn("partition_key",
          concat_ws("|", col("metric"), col("pair"), unix_timestamp(col("win_start"))))
        .join(pendingKeys, Seq("partition_key"), "left_semi")

      val ccCached = cc.cache()
      ccCached.drop("partition_key")
        .withColumn("day", to_date(col("win_start")))
        .write.mode(SaveMode.Append).partitionBy("day").parquet(dataPath(outDir))

      // manifest AFTER data: crash between the two → deterministic recompute.
      // Written distributed (no driver collect — the work list can be huge
      // at production scale).
      val cfgHash = cfg.hash
      pending
        .join(ccCached.select(col("partition_key"), col("status").as("cc_status")),
          Seq("partition_key"), "left")
        .select(
          lit(jobId).as("job_id"),
          lit("cc").as("stage"),
          col("partition_key"),
          // carry the kernel's verdict: 1 processed, -1 missing_data
          // (degenerate window), matching init.py:244-247 flag semantics
          coalesce(col("cc_status"), lit(-1)).cast("byte").as("status"),
          lit(2L).as("rows_in"),
          lit(1L).as("rows_out"),
          current_timestamp().as("started_ts"),
          current_timestamp().as("finished_ts"),
          lit(cfgHash).as("input_hash"),
          lit(s"xcorrspark: ccPairs(${cfgHash.take(8)})").as("history")
        )
        .write.mode(SaveMode.Append).parquet(manifestPath(outDir))
      ccCached.unpersist()

      TableFormat.writeProps(outDir, Cf19.props(
        title = "xcorrspark pairwise cross-correlation",
        extra = Map("job_config_sha256" -> cfgHash)))
      TableFormat.appendSnapshot(outDir, Map(
        "job_id" -> jobId, "written" -> nPending.toString, "config" -> cfgHash))
    }
    pending.unpersist()
    series.unpersist()
    Stats(nTotal, nPending, nPending)
  }
}
