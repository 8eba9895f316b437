package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Accessors._
import graft.kernel.{Cc, Filter, Signal}
import graft.ops.{Correlate, Ingest, Postprocess, Preprocess}
import graft.synth.Transcripts

/** Preprocess registry, postprocess chain, custom TokenCount expression and
  * the accessor API.
  */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val series = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    Ingest.series(Transcripts.generate(spark, 6, 80).toDF(), 60).cache()
  }

  test("TokenCount expression == size(split(trim, '\\s+')) on real text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      graft.functions.TokenCount(col("text")).as("fast"),
      expr("size(split(trim(text), '\\\\s+'))").as("regex")
    ).where(col("fast") =!= col("regex"))
    assert(diff.count() == 0)
    // edge cases
    import spark.implicits._
    val edge = Seq("", "  ", "a", " a ", "a b", "a\tb\nc", "  a   b  ").toDF("text")
    val got = edge.select(graft.functions.TokenCount(col("text"))).as[Int].collect()
    assert(got.sameElements(Array(0, 0, 1, 1, 2, 3, 2)))
  }

  test("preprocess demean: per-key mean becomes 0") {
    val out = Preprocess(series, Seq("demean" -> Map.empty))
    val m = out.groupBy("conv_id", "metric").agg(abs(avg("value")).as("m"))
      .agg(max("m")).collect()(0).getDouble(0)
    assert(m < 1e-9)
  }

  test("preprocess normalize: max |value| is 1 per key") {
    val out = Preprocess(series, Seq("normalize" -> Map.empty))
    val m = out.groupBy("conv_id", "metric").agg(max(abs(col("value"))).as("m")).collect()
    m.foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-12))
  }

  test("preprocess detrend: residual linear fit slope ~ 0") {
    val out = Preprocess(series, Seq("detrend" -> Map.empty))
    val slopes = out.groupBy("conv_id", "metric")
      .agg(expr("regr_slope(value, cast(unix_micros(cast(ts as timestamp)) as double) / 1e6)").as("s"))
      .collect()
    slopes.foreach(r => assert(math.abs(r.getDouble(2)) < 1e-9, r))
  }

  test("preprocess running_rms re-rates the grid and matches sqrt(mean(x^2))") {
    val out = Preprocess(series, Seq("running_rms" -> Map("window" -> "3600")))
    // recompute one cell by hand
    val cell = out.orderBy("conv_id", "metric", "ts").limit(1).collect()(0)
    val cid = cell.getString(0); val met = cell.getString(1); val t0 = cell.getTimestamp(2)
    val vals = series.where(col("conv_id") === cid && col("metric") === met &&
        col("ts") >= lit(t0) && col("ts") < lit(new java.sql.Timestamp(t0.getTime + 3600 * 1000)))
      .select("value").collect().map(_.getDouble(0))
    val want = math.sqrt(vals.map(v => v * v).sum / vals.length)
    assert(math.abs(cell.getDouble(3) - want) < 1e-9)
  }

  test("preprocess fold order + hash stability") {
    val ops = Seq("demean" -> Map.empty[String, String], "normalize" -> Map.empty[String, String])
    val h1 = Preprocess.hashOps(ops)
    val h2 = Preprocess.hashOps(ops)
    assert(h1 == h2 && h1.length == 64)
    assert(Preprocess.hashOps(ops.reverse) != h1, "order must matter")
    intercept[IllegalArgumentException](Preprocess(series, Seq("nope" -> Map.empty)))
  }

  test("postprocess chain equals manual kernel composition on one row") {
    import spark.implicits._
    val t = Transcripts.generate(spark, 4, 120).toDF()
    val s = Ingest.series(t, 60)
    val wins = Correlate.windows(s, 1800, 1800, 60)
    val pairs = Seq(("conv-000000", "conv-000001")).toDF("conv_a", "conv_b")
    val cc = Correlate.ccPairs(wins, pairs, 60, 1800).toDF()
    assume(cc.where(col("status") === 1).count() > 0)
    val cfg = Postprocess.Config(stepSec = 60, unbias = true, taperSec = 300,
      filterFreqHz = 0.002, taper2Sec = 120, lagMinSec = -600, lagMaxSec = 600)
    val out = Postprocess(cc, cfg)
    val row = out.orderBy("metric", "win_start").limit(1)
      .select("pair", "metric", "win_start", "cc").as[(String, String, java.sql.Timestamp, Array[Double])].head()
    val in = cc.where(col("status") === 1)
      .where(col("pair") === row._1 && col("metric") === row._2 && col("win_start") === lit(row._3))
      .select("cc", "pair_offset", "time_offset").as[(Array[Double], Double, Double)].head()
    // manual chain
    val n = (in._1.length + 1) / 2
    var x = in._1.clone()
    val wgt = Cc.weight(n)
    x = x.indices.map(i => x(i) * wgt(i)).toArray
    x = Signal.demean(x)
    x = Signal.taper(x, 0.5, 5) // 300 s at fs = 1/60 Hz → 5 samples
    val delay = -(in._2 + in._3)
    if (delay != 0) {
      x = Signal.timeshift(x, delay, 60.0)
      if (x.length < 2 * n - 1) x = java.util.Arrays.copyOf(x, 2 * n - 1)
    }
    x = Filter.highpassFiltFilt(x, 0.002, 1 / 60.0, 2)
    x = Signal.taper(x, 0.5, 2)
    val lags = Cc.lagAxis(n, 60.0)
    val expected = lags.indices.filter(i => lags(i) >= -600 && lags(i) <= 600).map(x).toArray
    assert(row._4.length == expected.length)
    row._4.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("snr over a cc table produces s/n with the peak lag") {
    import spark.implicits._
    val t = Transcripts.generate(spark, 4, 150).toDF()
    val s = Ingest.series(t, 60)
    val wins = Correlate.windows(s, 1800, 1800, 60)
    val pairs = Correlate.allPairs(s)
    val cc = Correlate.ccPairs(wins, pairs, 60, 1800).toDF().where(col("status") === 1)
    assert(cc.count() > 0, "no informative cc windows in fixture")
    val out = Postprocess.snr(cc, 60.0, signalBand = (-300, 300), noiseBand = (600, 1500))
    val r = out.limit(1).select("s", "n", "snr", "lag_s_max").collect()(0)
    assert(r.getDouble(0) >= 0 && r.getDouble(1) >= 0)
    assert(math.abs(r.getDouble(2) - r.getDouble(0) / r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(3)) <= 300)
  }

  test("accessor API chains the pipeline fluently") {
    import spark.implicits._
    val t = Transcripts.generate(spark, 4, 100).toDF()
    val m1 = t.xcorr.series(60).xcorr.rollup("minute")
    assert(m1.count() > 0)
    val viz = t.xcorr.series(60).xcorr.lttb(20)
    assert(viz.groupBy("conv_id", "metric").count().agg(max("count")).collect()(0).getLong(0) <= 20)
  }
}
