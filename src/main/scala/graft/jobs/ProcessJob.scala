package graft.jobs

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
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
  *  - "skip already processed" = LEFT ANTI join of the work list against
  *    the manifest (process.py:93-104's `status != 0` skip — Spark has no
  *    cross-run memo, so the manifest table IS the memo, SURVEY.md §4);
  *  - results append-write, manifest rows written AFTER data (write-after-
  *    data ordering): a crash between the two re-computes a deterministic
  *    result, so duplicates are identical rows and `readCc` dedupes by key;
  *  - per-partition lineage + metrics land in the manifest rows, and the
  *    job config hash is revalidated like the reference's preprocess hash
  *    gate (/root/reference/xcorr/core/process.py:68-73).
  */
object ProcessJob {

  final case class Config(
      stepSec: Long = 60,
      windowSec: Long = 3600,
      strideSec: Long = 3600,
      normalize: Boolean = true,
      clipLagSec: Double = -1
  ) {
    def hash: String = Hasher.hashObj(Map(
      "stepSec" -> stepSec, "windowSec" -> windowSec, "strideSec" -> strideSec,
      "normalize" -> normalize, "clipLagSec" -> clipLagSec))
  }

  final case class Stats(total: Long, pending: Long, written: Long)

  private def manifestPath(outDir: String) = s"$outDir/_manifest"
  private def dataPath(outDir: String) = s"$outDir/data"

  /** True if the directory (recursively) holds at least one parquet part —
    * an existing-but-empty dir (e.g. created by a crashed write) must read
    * as an empty table, not an inference error.
    */
  private def hasParquet(p: String): Boolean = {
    def rec(f: java.io.File): Boolean = {
      if (!f.exists()) return false
      if (f.isFile) return f.getName.endsWith(".parquet")
      val kids = f.listFiles()
      kids != null && kids.exists(rec)
    }
    rec(new java.io.File(p))
  }

  def readManifest(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val p = manifestPath(outDir)
    if (hasParquet(p)) spark.read.parquet(p)
    else spark.emptyDataset[ManifestRow].toDF()
  }

  /** Completed CC table with idempotent duplicate collapse (recomputed rows
    * are bit-identical, so any-row-per-key is exact).
    */
  def readCc(spark: SparkSession, outDir: String): DataFrame = {
    val p = dataPath(outDir)
    if (!hasParquet(p)) return spark.emptyDataFrame
    spark.read.parquet(p).dropDuplicates("pair", "metric", "win_start")
  }

  /** Run (or resume) the job. `maxWindows` > 0 processes only that many
    * work items this invocation — used by the resume tests to simulate a
    * partial run / crash.
    */
  /** @param retryMissing re-process cells previously flagged -1
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
    import spark.implicits._
    val jobId = s"ccjob-${cfg.hash.take(12)}"

    val series = Ingest.series(transcripts, cfg.stepSec)
    val wins = Correlate.windows(series, cfg.windowSec, cfg.strideSec, cfg.stepSec)

    // full work list: every (pair, metric, win_start) where both sides have
    // a complete window
    val a = wins.select(col("conv_id").as("conv_a"), col("metric"), col("win_start"))
    val b = wins.select(col("conv_id").as("conv_b"), col("metric"), col("win_start"))
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
    // status-flag skip (process.py:93-104)
    val doneStatuses = if (retryMissing) Seq(1) else Seq(1, -1)
    val done = readManifest(spark, outDir)
      .where(col("status").isin(doneStatuses: _*) && col("job_id") === jobId)
      .select(col("partition_key"))

    var pending = work.join(done, Seq("partition_key"), "left_anti")
    if (maxWindows > 0) pending = pending.limit(maxWindows)
    pending = pending.cache()
    val nPending = pending.count()
    val nTotal = work.count()

    if (nPending > 0) {
      val pendingPairs = pending.select(col("conv_a"), col("conv_b")).distinct()
      val pendingKeys = pending.select("partition_key")
      val cc = Correlate
        .ccPairs(wins, pendingPairs, cfg.stepSec, cfg.windowSec, cfg.normalize,
          unbiased = false, clipLagSec = cfg.clipLagSec)
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
    Stats(nTotal, nPending, nPending)
  }
}
