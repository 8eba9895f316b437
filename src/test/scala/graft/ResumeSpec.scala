package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.jobs.ProcessJob
import graft.meta.TableFormat
import graft.synth.Transcripts

/** Checkpoint-resume gate (BASELINE.md (b) "Resumability"): a partial run
  * followed by a resume converges to the same table as a from-scratch run,
  * with no duplicate work (manifest anti-join semantics of
  * /root/reference/xcorr/core/process.py:93-104).
  */
class ResumeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kill-after-partial-manifest rerun == from-scratch run, no duplicate work") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val transcripts = Transcripts.generate(spark, 8, 150).toDF().cache()
    val pairs = Seq(
      ("conv-000000", "conv-000001"), ("conv-000002", "conv-000003"),
      ("conv-000004", "conv-000005"), ("conv-000001", "conv-000006")
    ).toDF("conv_a", "conv_b")
    val cfg = ProcessJob.Config(stepSec = 60, windowSec = 1800, strideSec = 1800)

    val dirPartial = java.nio.file.Files.createTempDirectory("cc-partial").toString
    val dirFull = java.nio.file.Files.createTempDirectory("cc-full").toString

    // from-scratch run
    val full = ProcessJob.run(spark, transcripts, pairs, dirFull, cfg)
    assert(full.pending == full.total && full.total > 4, s"want real work, got $full")

    // partial run ("crash" after k windows), then resume
    val part1 = ProcessJob.run(spark, transcripts, pairs, dirPartial, cfg, maxWindows = 3)
    assert(part1.written == 3)
    val part2 = ProcessJob.run(spark, transcripts, pairs, dirPartial, cfg)
    assert(part2.pending == full.total - 3, s"resume recomputed: $part2")
    // third run: nothing to do
    val part3 = ProcessJob.run(spark, transcripts, pairs, dirPartial, cfg)
    assert(part3.pending == 0)

    // identical final tables
    val a = ProcessJob.readCc(spark, dirPartial).drop("day")
    val b = ProcessJob.readCc(spark, dirFull).drop("day")
    assert(a.count() == full.total && b.count() == full.total)
    val diff = a.select("pair", "metric", "win_start", "shift", "cc_max")
      .union(b.select("pair", "metric", "win_start", "shift", "cc_max"))
      .groupBy("pair", "metric", "win_start", "shift", "cc_max").count()
      .where(col("count") =!= 2)
    assert(diff.count() == 0, "resumed table differs from from-scratch table")
    // cc arrays equal too
    val ccA = a.select(col("pair"), col("metric"), col("win_start"), col("cc")).as[(String, String, java.sql.Timestamp, Array[Double])]
      .collect().map(r => ((r._1, r._2, r._3.getTime), r._4)).toMap
    val ccB = b.select(col("pair"), col("metric"), col("win_start"), col("cc")).as[(String, String, java.sql.Timestamp, Array[Double])]
      .collect().map(r => ((r._1, r._2, r._3.getTime), r._4)).toMap
    assert(ccA.keySet == ccB.keySet)
    ccA.foreach { case (k, v) => assert(v.sameElements(ccB(k)), s"cc differs at $k") }

    // manifest carries kernel status flags (1 processed, -1 missing_data)
    // and retry_missing reprocesses exactly the -1 cells
    val manifest = ProcessJob.readManifest(spark, dirPartial)
    val nMissing = manifest.where(col("status") === -1).count()
    val nDone = manifest.where(col("status") === 1).count()
    assert(nDone + nMissing >= full.total, s"manifest under-covers: $nDone + $nMissing < ${full.total}")
    val retry = ProcessJob.run(spark, transcripts, pairs, dirPartial, cfg, retryMissing = true)
    assert(retry.pending == nMissing, s"retryMissing reprocessed ${retry.pending}, want $nMissing")

    // CF-1.9 properties persisted (north rule: metadata conventions as
    // table properties)
    val props = TableFormat.readProps(dirPartial)
    assert(props.get("Conventions").contains("CF-1.9"))
    assert(props.contains("sha256_hash_metadata"))
    transcripts.unpersist()
  }

  test("retry upgrade: readCc prefers the fresh status=1 row over a stale -1 for the same cell") {
    import spark.implicits._
    // the append-only data path can legitimately hold BOTH a degenerate
    // status=-1 row (first attempt: missing data) and a later status=1 row
    // (retry_missing after new data arrived) for one (pair, metric,
    // win_start) — the freshest-wins collapse must return the 1 row
    val dir = java.nio.file.Files.createTempDirectory("cc-retry").toString
    val t0 = new java.sql.Timestamp(1704067200000L)
    def write(cc: Array[Double], status: Byte, ccMax: Double): Unit =
      Seq(("a-b", "m", t0, cc, status, 0.0, -900.0, 0.0, ccMax, 2, 0, ""))
        .toDF("pair", "metric", "win_start", "cc", "status", "pair_offset",
          "time_offset", "shift", "cc_max", "npts", "lag0", "input_hash")
        .write.mode("append").parquet(s"$dir/data")
    write(Array(0.0, 0.0, 0.0), -1, 0.0) // stale degenerate
    write(Array(0.5, 1.0, 0.5), 1, 1.0)  // fresh recompute
    val got = ProcessJob.readCc(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Byte]("status") == 1 && got(0).getAs[Double]("cc_max") == 1.0)
  }
}
