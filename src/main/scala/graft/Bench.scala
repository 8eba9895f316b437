package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Ingest, Rollup}
import graft.synth.Transcripts

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "rollup_points_per_sec":N,"rollup_turns":N}
  *
  * Two workloads:
  *  1. headline operator queries from [[Queries]] on SPARK_GRAFT_SF_DIR
  *     (testdata parquet);
  *  2. the north-rule throughput metric — synthetic transcripts ingested to
  *     the tier-1 (1m) rollup, reported as rolled-up points/sec.
  */
object Bench {

  /** Ingest→tier-1 throughput on a deterministic synthetic transcript table.
    * Returns (points, seconds).
    */
  def rollupThroughput(spark: SparkSession, nConvs: Int, baseTurns: Int): (Long, Long, Double) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val t = Transcripts.generate(spark, nConvs, baseTurns, hotConvs = nConvs / 100, hotFactor = 50).toDF()
    val series = Ingest.series(t, 60)
    val m1 = Rollup.fromPoints(series, "minute")
    // count() forces the full pipeline; n sums = turns processed
    val agg = m1.agg(count(lit(1)).as("cells"), sum(col("n")).as("pts")).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    (agg.getLong(0), agg.getLong(1), secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq(
      "q01_pricing_summary", "q03_join_nation_region", "q07_running_sum",
      "q10_rollup_1m", "q11_rollup_compose_1h", "q12_gapfill_1h",
      "q14_sessionize", "q19_cc_pair_lags", "q22_gorilla_roundtrip",
      "q36_ngram_jaccard", "q37_minhash_lsh", "q40_knn_brute",
      "q50_xcorr_e2e", "q51_rollup_pipeline"
    )
    val fns = SparkEntry.queries
    val results = headline.map { name =>
      val t0 = System.nanoTime()
      try { fns(name)(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // north-rule metric: ingested-to-tier-1 points/sec on the synthetic table
    val (cells, turns, secs) = rollupThroughput(spark, nConvs = 2000, baseTurns = 600)
    val pps = cells / secs

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","rollup_points_per_sec":$pps%.0f,"rollup_tier1_cells":$cells,"rollup_turns":$turns,"rollup_sec":$secs%.3f,"cpus":"$cpus"}""")
    spark.stop()
  }
}
