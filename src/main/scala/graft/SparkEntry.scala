package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Correlate, Ingest, Rollup}
import graft.synth.Transcripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator surface lives in [[Queries]]; this object adapts it to the
  * harness shape.
  */
object SparkEntry {

  /** Flagship: the full xcorr-grafted pipeline at tiny scale — synthetic
    * transcripts → gap-filled series → pairwise windowed FFT CC → 1m rollup
    * of the series (north_star path end-to-end). Driver smoke-checks rows>0
    * on sf0.001 (the dir is unused: the flagship input is the deterministic
    * synthetic transcript table required by the north rule).
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val t = Transcripts.generate(spark, nConvs = 8, baseTurns = 80, hotConvs = 1, hotFactor = 5).toDF()
    val series = Ingest.series(t, 60)
    val wins = Correlate.windows(series, windowSec = 1800, strideSec = 900, stepSec = 60)
    val pairs = Seq(("conv-000000", "conv-000001"), ("conv-000002", "conv-000003"))
      .toDF("conv_a", "conv_b")
    val cc = Correlate.ccPairs(wins, pairs, stepSec = 60, windowSec = 1800).toDF()
    val (m1, _, _) = Rollup.cascade(series)
    cc.select(col("pair"), col("metric"), col("win_start"), col("shift"), col("cc_max"))
      .join(
        m1.groupBy(col("metric")).agg(count(lit(1)).as("tier1m_cells")),
        Seq("metric"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LTTB, the synthetic-input pipelines) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
