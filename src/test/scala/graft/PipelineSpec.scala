package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Correlate, Ingest, Rollup}
import graft.refimpl.Ref
import graft.synth.Transcripts

/** Golden gates (BASELINE.md (b)): Spark pipeline output must EXACTLY match
  * the single-node reference at every retention tier; CC windows must match
  * the reference cells bit-for-bit (same kernel, same inputs); per-turn
  * text equality must survive a store/read round-trip.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val tiny = Transcripts.generateLocal(nConvs = 12, baseTurns = 120, hotConvs = 2, hotFactor = 10)
  lazy val tinyDf = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.createDataset(tiny).toDF().repartition(7) // deliberately odd partitioning
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getString(1), r.getTimestamp(2).getTime)

  test("generator is deterministic and partitioning-independent") {
    import spark.implicits._
    val a = Transcripts.generate(spark, 5, 50).collect().sortBy(t => (t.conv_id, t.turn_idx))
    val b = Transcripts.generateLocal(5, 50).sortBy(t => (t.conv_id, t.turn_idx))
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("gap-filled series matches single-node reference exactly") {
    val got = Ingest.series(tinyDf, 60).collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2).getTime, r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val want = Ref.series(tiny, 60)
      .map(p => (p.convId, p.metric, p.tsMs, p.value))
      .sortBy(t => (t._1, t._2, t._3))
    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("rollup cascade 1m/1h/1d matches reference EXACTLY (bitwise)") {
    val points = Ingest.series(tinyDf, 60).cache()
    val (m1, h1, d1) = Rollup.cascade(points)
    val refPoints = Ref.series(tiny, 60)
    val refM1 = Ref.rollup(refPoints, "minute")
    val refH1 = Ref.rollupFromLower(refM1, "hour")
    val refD1 = Ref.rollupFromLower(refH1, "day")
    for ((df, ref, tier) <- Seq((m1, refM1, "1m"), (h1, refH1, "1h"), (d1, refD1, "1d"))) {
      val rows = df.collect()
      assert(rows.length == ref.size, s"$tier: ${rows.length} vs ${ref.size}")
      rows.foreach { r =>
        val k = key(r)
        val w = ref(k)
        val g = Ref.Stats(r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
        assert(g == w, s"$tier mismatch at $k: $g vs $w")
      }
    }
    points.unpersist()
  }

  test("chunk blobs round-trip the full tier-0 grid exactly") {
    val points = Ingest.series(tinyDf, 60)
    val chunks = Rollup.toChunks(points, "hour")
    val back = Rollup.fromChunks(chunks)
    assert(back.count() == points.count())
    val diff = back.union(points.select("conv_id", "metric", "ts", "value"))
      .groupBy("conv_id", "metric", "ts", "value").count().where(col("count") =!= 2)
    assert(diff.count() == 0, "chunk round-trip altered points")
  }

  test("windowed pairwise CC matches reference cells bit-for-bit") {
    val pairsSeq = Seq(("conv-000000", "conv-000001"), ("conv-000002", "conv-000005"))
    import spark.implicits._
    val pairsDf = pairsSeq.toDF("conv_a", "conv_b")
    val series = Ingest.series(tinyDf, 60)
    val wins = Correlate.windows(series, windowSec = 1800, strideSec = 900, stepSec = 60)
    val got = Correlate.ccPairs(wins, pairsDf, stepSec = 60, windowSec = 1800).collect()
      .map(c => ((c.pair, c.metric, c.win_start.getTime), c))
      .toMap
    val want = Ref.ccPairs(Ref.series(tiny, 60), pairsSeq, stepSec = 60, windowSec = 1800, strideSec = 900)
    assert(want.nonEmpty, "reference produced no CC cells — fixture too sparse")
    assert(got.size == want.size, s"${got.size} vs ${want.size} cells")
    want.foreach { w =>
      val g = got((w.pair, w.metric, w.winStartMs))
      assert(g.cc.length == w.cc.length)
      g.cc.zip(w.cc).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"${w.pair}@${w.winStartMs} lag $i: $a != $b")
      }
      assert(g.shift == w.shift && g.cc_max == w.ccMax)
      // status=1 for informative windows; -1 (missing_data) iff a side is
      // all-zero (reference init.py:244-247 semantics)
      assert(g.status == (if (w.cc.forall(_ == 0.0)) -1 else 1))
    }
  }

  test("per-turn text round-trips byte-equal under stable (conv_id, turn_idx) order") {
    val dir = java.nio.file.Files.createTempDirectory("transcripts").toString
    tinyDf.withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val back = spark.read.parquet(dir)
      .orderBy("conv_id", "turn_idx")
      .select("conv_id", "turn_idx", "text").collect()
    val want = tiny.sortBy(t => (t.conv_id, t.turn_idx))
    assert(back.length == want.length)
    back.zip(want).foreach { case (r, t) =>
      assert(r.getString(0) == t.conv_id && r.getInt(1) == t.turn_idx && r.getString(2) == t.text)
    }
  }

  test("lttb tier keeps <= threshold points per key incl. endpoints") {
    val points = Ingest.series(tinyDf, 60)
    val viz = Rollup.lttbTier(points, 50)
    val sizes = viz.groupBy("conv_id", "metric").count().collect()
    sizes.foreach(r => assert(r.getLong(2) <= 50))
    // endpoints preserved
    val ends = points.groupBy("conv_id", "metric").agg(min("ts").as("t0"), max("ts").as("t1"))
    val j = viz.join(ends, Seq("conv_id", "metric"))
      .groupBy("conv_id", "metric")
      .agg(max((col("ts") === col("t0")).cast("int")).as("hasFirst"),
           max((col("ts") === col("t1")).cast("int")).as("hasLast"))
      .where(col("hasFirst") =!= 1 || col("hasLast") =!= 1)
    assert(j.count() == 0)
  }
}
