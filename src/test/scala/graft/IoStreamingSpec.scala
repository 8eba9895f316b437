package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.jobs.ProcessJob
import graft.meta.{Cf19, TableFormat, TableIO}
import graft.streaming.StreamingRollup
import graft.synth.Transcripts

class IoStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("TableIO.read validates hashes, schema and masks status") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val t = Transcripts.generate(spark, 6, 120).toDF()
    val pairs = Seq(("conv-000000", "conv-000001"), ("conv-000002", "conv-000003")).toDF("conv_a", "conv_b")
    val dir = java.nio.file.Files.createTempDirectory("ccio").toString
    val cfg = ProcessJob.Config(stepSec = 60, windowSec = 1800, strideSec = 1800)
    ProcessJob.run(spark, t, pairs, dir, cfg)

    // happy path + status mask
    val df = TableIO.read(spark, dir, Seq("pair", "metric", "win_start", "cc", "status"),
      expectedConfigHash = Some(cfg.hash), maskStatus = true)
    assert(df.count() > 0)
    assert(df.where(col("status") =!= 1 && col("cc").isNotNull).count() == 0)

    // wrong config hash rejected (validate.py:185-194 semantics)
    intercept[TableIO.ValidationError] {
      TableIO.read(spark, dir, Seq("pair"), expectedConfigHash = Some("deadbeef"))
    }
    // missing column rejected
    intercept[TableIO.ValidationError] {
      TableIO.read(spark, dir, Seq("no_such_column"))
    }
    // tampered metadata hash rejected (validate.py:136-159)
    val props = TableFormat.readProps(dir)
    TableFormat.writeProps(dir, props + ("title" -> "tampered"))
    intercept[TableIO.ValidationError] {
      TableIO.read(spark, dir, Seq("pair"))
    }
    // re-stamping with a consistent hash heals it
    TableFormat.writeProps(dir, Cf19.props("healed", extra = Map("job_config_sha256" -> cfg.hash)))
    assert(TableIO.read(spark, dir, Seq("pair")).count() > 0)
  }

  test("TableIO.merge outer-aligns frames and collapses duplicate cells") {
    import spark.implicits._
    val a = Seq(("k1", 1, 10.0), ("k2", 1, 20.0)).toDF("pair", "t", "v")
    val b = Seq(("k2", 1, 20.0), ("k3", 2, 30.0)).toDF("pair", "t", "v")
    val m = TableIO.merge(Seq(a, b), Seq("pair", "t"))
    assert(m.count() == 3)
    assert(m.where(col("pair") === "k2").count() == 1)
    // allowMissingColumns: extra column in one frame survives as nulls
    val c = Seq(("k4", 3, 40.0, "x")).toDF("pair", "t", "v", "extra")
    val m2 = TableIO.merge(Seq(a, c), Seq("pair", "t"))
    assert(m2.columns.contains("extra") && m2.count() == 3)
    // status-aware collapse: the retry-upgraded status=1 cell wins over a
    // stale -1 from another table (readCc's freshest-wins rule)
    val s1 = Seq(("k1", 1, 0.0, -1)).toDF("pair", "t", "v", "status")
    val s2 = Seq(("k1", 1, 9.0, 1)).toDF("pair", "t", "v", "status")
    val ms = TableIO.merge(Seq(s1, s2), Seq("pair", "t")).collect()
    assert(ms.length == 1 && ms(0).getInt(3) == 1 && ms(0).getDouble(2) == 9.0)
  }

  test("TableIO.validateList: head eager, tail gated by head's config hash") {
    import spark.implicits._
    val t = Transcripts.generate(spark, 6, 120).toDF()
    val cfg = ProcessJob.Config(stepSec = 60, windowSec = 1800, strideSec = 1800)
    def mkTable(pa: String, pb: String): String = {
      val dir = java.nio.file.Files.createTempDirectory("ccvl").toString
      ProcessJob.run(spark, t, Seq((pa, pb)).toDF("conv_a", "conv_b"), dir, cfg)
      dir
    }
    // pairs chosen with overlapping spans (a pair with disjoint time spans
    // correctly yields zero common windows and writes nothing)
    val d1 = mkTable("conv-000000", "conv-000001")
    val d2 = mkTable("conv-000001", "conv-000002")
    val d3 = mkTable("conv-000002", "conv-000005")
    val frames = TableIO.validateList(spark, Seq(d1, d2, d3), Seq("pair", "metric", "win_start", "cc"))
    assert(frames.length == 3 && frames.forall(_.count() > 0))
    // a tail table written under a DIFFERENT config is rejected against the
    // head's hash (validate.py:185-194 via the head, :329-361 parallel tail)
    val alien = java.nio.file.Files.createTempDirectory("ccvl-alien").toString
    ProcessJob.run(spark, t, Seq(("conv-000001", "conv-000005")).toDF("conv_a", "conv_b"),
      alien, cfg.copy(windowSec = 900, strideSec = 900))
    intercept[TableIO.ValidationError] {
      TableIO.validateList(spark, Seq(d1, alien), Seq("pair"))
    }
  }

  test("TableFormat props/snapshots work through an explicit file: URI (Hadoop FS path)") {
    val dir = "file:" + java.nio.file.Files.createTempDirectory("tfuri").toString
    TableFormat.writeProps(dir, Cf19.props("uri-test"))
    val props = TableFormat.readProps(dir)
    assert(props("title") == "uri-test" && props("Conventions") == "CF-1.9")
    TableFormat.appendSnapshot(dir, Map("n" -> "1"))
    TableFormat.appendSnapshot(dir, Map("n" -> "2"))
    val snaps = TableFormat.snapshots(dir)
    assert(snaps.map(_("n")) == Seq("1", "2"))
    // atomic replace keeps the metadata hash self-consistent
    TableFormat.writeProps(dir, Cf19.props("uri-test-2"))
    assert(TableFormat.readProps(dir)("title") == "uri-test-2")
  }

  test("iceberg runtime adaptivity: the native path engages iff the jar is present") {
    val warehouse = java.nio.file.Files.createTempDirectory("iceberg-wh").toString
    val cfgs = TableFormat.icebergSessionConfigs(warehouse)
    assert(cfgs("spark.sql.catalog.graft.warehouse") == warehouse &&
      cfgs.contains("spark.sql.extensions"))
    if (!TableFormat.icebergAvailable) {
      // sandbox: no Iceberg jar (zero egress) — detection must say so and
      // the sidecar emulation must carry the Iceberg-style properties
      val dir = java.nio.file.Files.createTempDirectory("iceberg-emul").toString
      TableFormat.writeProps(dir, Cf19.props("emulated"))
      assert(TableFormat.readProps(dir)("Conventions") == "CF-1.9")
      cancel("Iceberg runtime not on classpath — native-path branch skipped (detection + emulation verified)")
    } else {
      // a runtime appeared: the wired classes must actually load and the
      // Hadoop-catalog entry point must construct (reflection — this code
      // cannot compile against the optional jar)
      Class.forName(cfgs("spark.sql.extensions"))
      Class.forName(cfgs("spark.sql.catalog.graft"))
      val tables = Class.forName("org.apache.iceberg.hadoop.HadoopTables")
        .getDeclaredConstructor(classOf[org.apache.hadoop.conf.Configuration])
        .newInstance(spark.sparkContext.hadoopConfiguration)
      assert(tables != null)
    }
  }

  test("appendSnapshot is append-only: max+1 indexing survives a removed snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("tfsnap").toString
    TableFormat.appendSnapshot(dir, Map("n" -> "1"))
    TableFormat.appendSnapshot(dir, Map("n" -> "2"))
    TableFormat.appendSnapshot(dir, Map("n" -> "3"))
    // a manually removed snapshot used to make the count-based index
    // collide with snap-00002 and silently overwrite committed history
    assert(new java.io.File(s"$dir/_snapshots/snap-00001.json").delete())
    TableFormat.appendSnapshot(dir, Map("n" -> "4"))
    val snaps = TableFormat.snapshots(dir)
    assert(snaps.map(_("n")) == Seq("1", "3", "4"),
      s"commit log must keep snap-2 ('3') and append '4' at max+1, got ${snaps.map(_("n"))}")
  }

  test("compactSnapshots folds the manifest into one checkpoint; reads unchanged; appends continue") {
    val dir = java.nio.file.Files.createTempDirectory("tfckpt").toString
    val rec = (i: Int) => Map("n" -> i.toString, "note" -> s"line\nbreak $i") // \n must survive JSONL
    (1 to 5).foreach(i => TableFormat.appendSnapshot(dir, rec(i)))
    val before = TableFormat.snapshots(dir)
    val pruned = TableFormat.compactSnapshots(dir)
    assert(pruned == 4, s"5 records fold to ckpt + kept cover: 4 pruned, got $pruned")
    assert(TableFormat.snapshots(dir) == before, "history must be identical after compaction")
    val files = new java.io.File(s"$dir/_snapshots").list()
      .filterNot(_.startsWith(".")).sorted.toSeq // drop Hadoop .crc sidecars
    assert(files == Seq("ckpt-snap-00004.json", "snap-00004.json"),
      s"expected one checkpoint + the kept cover, got $files")
    // idempotent: nothing new to fold
    assert(TableFormat.compactSnapshots(dir) == 0)
    // appends continue ABOVE the cover (no index recycling into the covered range)
    TableFormat.appendSnapshot(dir, Map("n" -> "6"))
    assert(TableFormat.snapshots(dir).map(_("n")) == (1 to 6).map(_.toString))
    // second compaction folds the newer record in
    assert(TableFormat.compactSnapshots(dir) == 2) // old ckpt + old cover pruned
    assert(TableFormat.snapshots(dir).map(_("n")) == (1 to 6).map(_.toString))
  }

  test("compactSnapshots crash-mid-prune leaves a readable store; rerun reclaims; index HWM survives cover removal") {
    val dir = java.nio.file.Files.createTempDirectory("tfckpt2").toString
    (1 to 3).foreach(i => TableFormat.appendSnapshot(dir, Map("n" -> i.toString)))
    // simulate the crash window: checkpoint committed, NOTHING pruned yet —
    // replay the commit step by compacting, then restoring a covered record
    // and a stale checkpoint alongside the new one
    TableFormat.compactSnapshots(dir)
    val snapDir = new java.io.File(s"$dir/_snapshots")
    java.nio.file.Files.write(snapDir.toPath.resolve("snap-00000.json"),
      "{\"n\":\"1\"}".getBytes("UTF-8")) // leftover covered record
    java.nio.file.Files.write(snapDir.toPath.resolve("ckpt-snap-00001.json"),
      "{\"n\":\"1\"}\n{\"n\":\"2\"}".getBytes("UTF-8")) // stale older checkpoint
    // reader ignores both leftovers — no double-count, newest cover wins
    assert(TableFormat.snapshots(dir).map(_("n")) == Seq("1", "2", "3"))
    // rerun reclaims the garbage and changes nothing visible
    assert(TableFormat.compactSnapshots(dir) == 2)
    assert(TableFormat.snapshots(dir).map(_("n")) == Seq("1", "2", "3"))
    // even if the kept cover record is manually removed, the checkpoint's
    // cover keeps the high-water mark: the next append must NOT mint an
    // index that sorts inside the covered range and vanish from reads
    assert(new java.io.File(snapDir, "snap-00002.json").delete())
    TableFormat.appendSnapshot(dir, Map("n" -> "4"))
    assert(TableFormat.snapshots(dir).map(_("n")) == Seq("1", "2", "3", "4"))
  }

  test("streaming trigger sessionizer (flatMapGroupsWithState) == batch islands on sealed periods") {
    import spark.implicits._
    import graft.streaming.StreamingTrigger
    val step = 60L
    def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * step * 1000)
    // active steps with several islands; the last island is left "open"
    // (could still be extended) so only sealed islands may be emitted
    val onSteps = Seq(5, 6, 7, 8, 20, 21, 40, 41, 42, 43, 44, 80, 81, 82)
    val active = onSteps.map(i => (ts(i), 2L))
    val dir = java.nio.file.Files.createTempDirectory("stream-trig").toString
    active.toDF("time", "n_on").write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream
      .schema("time timestamp, n_on long").parquet(dir)
    val q = StreamingTrigger.sessionize(streamIn, step, minDurationSteps = 3)
      .writeStream.outputMode("append").format("memory").queryName("stream_trigger")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT period_start, period_end, n_steps FROM stream_trigger")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).sortBy(_._1.getTime)
    // batch reference on the same steps: the final island (80..82) is NOT
    // sealed at end-of-stream (watermark == max event time), so streaming
    // must emit exactly the earlier islands that pass minDuration
    val cf = active.map { case (t, _) => ("k1", t, 5.0) }
      .flatMap(r => Seq(r, ("k2", r._2, 5.0))).toDF("key", "time", "value")
    val batch = graft.ops.Trigger.periods(cf, 1.0, 2, step, minDurationSteps = 3)
      .orderBy("period_start")
      .collect().map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    val sealedBatch = batch.filter(_._2.getTime < ts(82).getTime)
    assert(got.toSeq == sealedBatch.toSeq,
      s"streaming ${got.toSeq} != sealed batch ${sealedBatch.toSeq}")
    assert(got.nonEmpty)
  }

  test("streaming cascade: 1h from sealed 1m, then 1d from sealed 1h == batch fromLower") {
    import spark.implicits._
    // ~3-day span so day-tier cells actually seal
    val t = Transcripts.generate(spark, 3, 1600).toDF()
    val m1 = graft.ops.Rollup.fromPoints(graft.ops.Ingest.series(t, 60), "minute")
      .cache()

    // one cascade stage: sealed lower-tier parquet -> fromSealed(unit) vs
    // the batch fold restricted to windows the watermark closed
    def stage(lower: org.apache.spark.sql.DataFrame, unit: String, span: String,
        qname: String): org.apache.spark.sql.DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory(s"stream-cascade-$unit").toString
      lower.write.mode("overwrite").parquet(dir)
      val streamIn = spark.readStream.schema(lower.schema).parquet(dir)
      val q = StreamingRollup.fromSealed(streamIn, unit, lateness = "0 seconds")
        .writeStream.outputMode("append").format("memory").queryName(qname)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val got = spark.sql(s"SELECT * FROM $qname")
      val maxChunk = lower.agg(max("chunk_start")).collect()(0).getTimestamp(0)
      val want = graft.ops.Rollup.fromLower(lower, unit)
        .where(col("chunk_start") + expr(s"interval $span") <= lit(maxChunk))
      // all stats are integral-valued doubles/longs -> exact equality
      val cols = got.columns.toSeq
      val diff = got.union(want.select(cols.map(col): _*))
        .groupBy(cols.map(col): _*).count().where(col("count") =!= 2)
      assert(got.count() > 0 && got.count() == want.count(),
        s"$unit: ${got.count()} streamed vs ${want.count()} batch-sealed cells")
      assert(diff.count() == 0, s"$unit tier differs from batch fromLower")
      got
    }

    val h1sealed = stage(m1, "hour", "1 hour", "cascade_h1")
    stage(h1sealed, "day", "1 day", "cascade_d1")
  }

  test("streaming tier-1 rollup equals the batch tier on the same data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-in").toString
    val t = Transcripts.generate(spark, 5, 80).toDF()
    t.write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(t.schema).parquet(dir)
    val agg = StreamingRollup.tier1m(streamIn, lateness = "0 seconds")
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_tier1m")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT conv_id, chunk_start, turn_rate, token_volume FROM stream_tier1m")
    // batch equivalent over occupied buckets only (streaming emits no
    // gap-fill rows), restricted to windows the watermark has CLOSED —
    // append mode never emits windows still open at end-of-stream
    val maxTs = t.agg(max("ts")).collect()(0).getTimestamp(0)
    val want = graft.ops.Ingest.bucketed(t, 60)
      .select(col("conv_id"), col("ts").as("chunk_start"), col("turn_rate"), col("token_volume"))
      .where(col("chunk_start") + expr("interval 60 seconds") <= lit(maxTs))
    val diff = got.union(want)
      .groupBy("conv_id", "chunk_start", "turn_rate", "token_volume")
      .count().where(col("count") =!= 2)
    assert(got.count() > 0 && got.count() == want.count())
    assert(diff.count() == 0, "streaming tier differs from batch tier")
  }

  test("compactSnapshots: random append/compact interleavings never lose or reorder history") {
    val rng = new scala.util.Random(7)
    val dir = java.nio.file.Files.createTempDirectory("tfckpt3").toString
    var appended = 0
    (1 to 60).foreach { _ =>
      if (rng.nextInt(3) == 0) TableFormat.compactSnapshots(dir)
      else {
        appended += 1
        TableFormat.appendSnapshot(dir, Map("n" -> appended.toString))
      }
      val seen = TableFormat.snapshots(dir).map(_("n"))
      assert(seen == (1 to appended).map(_.toString),
        s"history diverged after $appended appends: $seen")
    }
    // end state folds to checkpoint + kept cover + any post-compact tail
    TableFormat.compactSnapshots(dir)
    val files = new java.io.File(s"$dir/_snapshots").list()
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(files.count(_.startsWith("ckpt-")) == 1 && files.size == 2, s"got $files")
  }

  test("tier1m watermark: late-within-horizon rows fold; later-than-watermark rows drop deterministically") {
    import spark.implicits._
    // the production late-data contract at the streaming tier: a turn that
    // arrives after its window sealed is DROPPED (never a partial re-emit
    // that would double-count in the cascade), a turn inside the lateness
    // horizon folds into the still-open window. Two AvailableNow runs over
    // one checkpoint make the batch boundary (and the persisted watermark)
    // deterministic.
    val base = java.nio.file.Files.createTempDirectory("late-rows").toString
    val in = s"$base/in"
    def ts(m: Int, s: Int) = new java.sql.Timestamp(1704067200000L + (m * 60 + s) * 1000L)
    def write(rs: (Int, Int)*): Unit =
      rs.map { case (m, s) => ("c", ts(m, s), "w") }.toDF("conv_id", "ts", "text")
        .coalesce(1).write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamingRollup.tier1m(
          spark.readStream.schema(spark.read.parquet(in).schema).parquet(in),
          lateness = "2 minutes")
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    // run 1: on-time turns; final watermark = 9:10 - 2:00 = 7:10, so
    // minute-windows 0..3 seal and evict; [9,10) stays open in state
    write((0, 10), (1, 10), (2, 10), (3, 10), (9, 10))
    runOnce()
    // run 2 against the SAME checkpoint (watermark restored at 7:10):
    //   3:20 -> window [3,4) already sealed  -> dropped
    //   8:30 -> window [8,9) end 9:00 > 7:10 -> folds (late but in horizon)
    //   12:10 on-time -> watermark 10:10 seals [8,9) and [9,10)
    write((3, 20), (8, 30), (12, 10))
    runOnce()
    val got = spark.read.parquet(s"$base/out")
      .select(((unix_timestamp(col("chunk_start")) - 1704067200L) / 60).cast("int").as("m"),
        col("turn_rate").cast("long").as("n"))
      .as[(Int, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L, 8 -> 1L, 9 -> 1L),
      s"sealed tier got ${got.mkString(",")}: window 3 must NOT refold the too-late row, " +
        "window 8 must contain the in-horizon late row, window 12 stays open")
  }

  test("streaming windowed CC: sealed windows equal the batch kernel bit-for-bit") {
    import spark.implicits._
    import graft.ops.{Correlate, Ingest}
    // dense two-conv activity so every candidate window has data on both
    // sides (streaming omits all-zero windows; head-of-feed windows with
    // leading zeros are a documented semantic difference, so the assertion
    // is batch-sealed ⊆ streaming with identical arrays)
    val t = Transcripts.generate(spark, 2, 400).toDF()
    val series = Ingest.seriesSparse(t, 60).cache()
    val dir = java.nio.file.Files.createTempDirectory("stream-cc").toString
    series.write.mode("overwrite").parquet(dir)
    val pairs = Seq(("conv-000000", "conv-000001")).toDF("conv_a", "conv_b")

    val streamIn = spark.readStream.schema(series.schema).parquet(dir)
    val q = graft.streaming.StreamingCc.ccWindows(streamIn, pairs, 1800, 900, 60)
      .writeStream.outputMode("append").format("memory").queryName("stream_cc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT pair, metric, win_start, cc, status FROM stream_cc")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2).getTime,
        r.getSeq[Double](3).toList, r.getByte(4)))
    assert(got.nonEmpty, "no sealed windows emitted")
    val gotKeys = got.map(x => (x._1, x._2, x._3)).toSet
    assert(gotKeys.size == got.length, "duplicate emission for a sealed window")

    // batch reference restricted to windows the final watermark sealed AND
    // with signal on both sides (status=1): a both-sides-silent window has
    // no streaming state to seal — the batch path only knows to emit its
    // -1 row from the observed span, which a live feed does not have
    val maxTsMs = series.agg(max("ts")).collect()(0).getTimestamp(0).getTime
    val batch = Correlate.ccPairs(Correlate.windows(series, 1800, 900, 60), pairs, 60, 1800)
      .toDF().collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2).getTime,
        r.getSeq[Double](3).toList, r.getByte(4)))
      .filter(x => x._3 + 1800 * 1000L < maxTsMs && x._5 == 1)
    assert(batch.nonEmpty, "fixture produced no sealed batch windows")
    val gotMap = got.map(x => (x._1, x._2, x._3) -> ((x._4, x._5))).toMap
    batch.foreach { case (p, m, w, cc, st) =>
      val g = gotMap.get((p, m, w))
      assert(g.isDefined, s"batch window ($p,$m,$w) missing from the stream")
      assert(g.get._1 == cc && g.get._2 == st, s"window ($p,$m,$w) differs from batch")
    }
  }

  test("streaming exact dedup keeps one doc per content hash (bounded state)") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)
    // 30 docs, 10 distinct texts, duplicates arriving within the horizon
    val docs = (0 until 30).map(i => (i.toLong, ts(i), s"doc text number ${i % 10}"))
      .toDF("doc_id", "ts", "text")
    val dir = java.nio.file.Files.createTempDirectory("stream-dedup").toString
    docs.write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream.schema(docs.schema).parquet(dir)
    val q = StreamingDedup.distinctDocs(streamIn, horizon = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("stream_dedup")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT content_hash FROM stream_dedup").collect().map(_.getString(0))
    assert(got.length == 10, s"expected 10 distinct hashes, got ${got.length}")
    assert(got.distinct.length == 10)
  }

  test("streaming curation equals batch Curation on sealed in-order input") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)
    val rows = Seq(
      (0L, "w1 w2 w3 w4 w5 w6"),                        // bench
      (1L, "spam spam spam spam spam spam spam spam"),  // repetitive
      (2L, "tiny doc"),                                 // < minWords
      (3L, "alpha beta gamma delta epsilon"),           // survivor
      (4L, "dup text goes here exactly now"),           // dup keeper (first-seen == min id)
      (5L, "dup text goes here exactly now"),           // dropped dup
      (6L, "w1 w2 w3 w4 w5 zz"),                        // contaminated
      (10L, "p q r s t"))                               // bench
    val docs = rows.zipWithIndex
      .map { case ((id, tx), i) => (id, ts(i), tx) }.toDF("doc_id", "ts", "text")
    val dir = java.nio.file.Files.createTempDirectory("stream-curate").toString
    // one partition, id order: first-seen == min-id so the two dedup faces agree
    docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingCuration.curate(
        spark.readStream.schema(docs.schema).parquet(dir),
        bench = docs.where(col("doc_id") % 10 === 0),
        benchPred = col("doc_id") % 10 === 0)
      .writeStream.outputMode("append").format("memory").queryName("stream_curate")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql(
      "SELECT doc_id, n_words, n_sh, n_hit, bucket, split FROM stream_curate")
    val want = graft.ops.Curation.curate(docs, "doc_id", "text",
      benchPred = col("doc_id") % 10 === 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"stream=${got.collect().mkString(";")} batch=${want.collect().mkString(";")}")
    assert(got.count() == 2) // docs 3 and 4
  }

  test("gopherQuality + pqEncodeWith run unchanged over a stream (stateless maps == batch)") {
    import org.apache.spark.sql.streaming.Trigger
    // both ops are pure per-row codegen maps — the claim here is that they
    // are literally streaming-safe, not re-implementations: the same
    // library call over readStream must equal the batch call row-for-row
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dDir = java.nio.file.Files.createTempDirectory("stream-gopher").toString
    docs.write.mode("overwrite").parquet(dDir)
    val gq = graft.ops.TextQuality.gopherQuality(
        spark.readStream.schema(docs.schema).parquet(dDir), "doc_id", "text", 25, 80)
      .writeStream.outputMode("append").format("memory").queryName("stream_gopher")
      .trigger(Trigger.AvailableNow()).start()
    gq.awaitTermination(120000)
    val gGot = spark.sql("SELECT * FROM stream_gopher")
    val gWant = graft.ops.TextQuality.gopherQuality(docs, "doc_id", "text", 25, 80)
    assert(gGot.count() == 500 &&
      gGot.exceptAll(gWant).count() == 0 && gWant.exceptAll(gGot).count() == 0)
    // PQ encode of a streaming corpus against a FROZEN batch codebook (the
    // production shape: codebooks are trained offline, the corpus arrives)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val eDir = java.nio.file.Files.createTempDirectory("stream-pq").toString
    emb.write.mode("overwrite").parquet(eDir)
    val codebook = emb.where(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"),
        expr(graft.ops.Similarity.castVec).as("cv"))
    val pq = graft.ops.Similarity.pqEncodeWith(
        spark.readStream.schema(emb.schema).parquet(eDir), codebook)
      .selectExpr("vec_id", "concat_ws('-', codes) AS code_s")
      .writeStream.outputMode("append").format("memory").queryName("stream_pq")
      .trigger(Trigger.AvailableNow()).start()
    pq.awaitTermination(120000)
    val pGot = spark.sql("SELECT * FROM stream_pq")
    val pWant = graft.ops.Similarity.pqEncode(emb)
      .selectExpr("vec_id", "concat_ws('-', codes) AS code_s")
    assert(pGot.count() == 500 &&
      pGot.exceptAll(pWant).count() == 0 && pWant.exceptAll(pGot).count() == 0)
  }

  test("streaming as-of join: sealed left rows equal the batch operator") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // two keys; lefts every 60 s, rights every 150 s (unique right ts/key)
    val lefts = (for {
      k <- Seq("A", "B"); i <- 0 until 60
    } yield (k, t(1000000L + i * 60), (if (k == "A") 0 else 1000) + i.toLong))
      .toDF("key", "ts", "event_id")
    val rights = (for {
      k <- Seq("A", "B"); i <- 0 until 20
    } yield (k, t(1000000L + 30 + i * 150), (if (k == "A") 0.5 else 100.5) + i))
      .toDF("key", "ts", "ref_value")
    val lDir = java.nio.file.Files.createTempDirectory("asof-l").toString
    val rDir = java.nio.file.Files.createTempDirectory("asof-r").toString
    lefts.write.mode("overwrite").parquet(lDir)
    rights.write.mode("overwrite").parquet(rDir)

    val q = graft.streaming.StreamingAsof.leftAsof(
        spark.readStream.schema(lefts.schema).parquet(lDir),
        spark.readStream.schema(rights.schema).parquet(rDir))
      .writeStream.outputMode("append").format("memory").queryName("stream_asof")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT key, event_id, ref_value, asof_ts FROM stream_asof")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.getTimestamp(3)).map(_.getTime))))
      .toMap

    // batch reference, restricted to lefts the final global watermark
    // sealed (min of the two inputs' max event times, strict)
    val wmMs = math.min(
      lefts.agg(max("ts")).collect()(0).getTimestamp(0).getTime,
      rights.agg(max("ts")).collect()(0).getTimestamp(0).getTime)
    val batch = graft.ops.AsofJoin.leftAsof(
        lefts, rights, Seq("key"), "ts", "ts", Seq("ref_value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.getTimestamp(4)).map(_.getTime)))
      .filter(_._2 < wmMs)
    assert(batch.nonEmpty && got.nonEmpty)
    batch.foreach { case (k, _, id, v, rts) =>
      val g = got.get((k, id))
      assert(g.isDefined, s"sealed left ($k,$id) missing from the stream")
      assert(g.get == ((v, rts)), s"($k,$id): stream ${g.get} != batch ${(v, rts)}")
    }
    // no duplicates, no unsealed emissions
    assert(got.size == batch.length,
      s"stream emitted ${got.size} rows, batch sealed set has ${batch.length}")

    // tolerance path: matches older than 120 s are nulled, and the carry
    // becomes GC-able — still equal to the batch operator
    val q2 = graft.streaming.StreamingAsof.leftAsof(
        spark.readStream.schema(lefts.schema).parquet(lDir),
        spark.readStream.schema(rights.schema).parquet(rDir),
        toleranceSec = Some(120L))
      .writeStream.outputMode("append").format("memory").queryName("stream_asof_tol")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val gotTol = spark.sql("SELECT key, event_id, ref_value, asof_ts FROM stream_asof_tol")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.getTimestamp(3)).map(_.getTime))))
      .toMap
    val batchTol = graft.ops.AsofJoin.leftAsof(
        lefts, rights, Seq("key"), "ts", "ts", Seq("ref_value"),
        toleranceSec = Some(120L))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.getTimestamp(4)).map(_.getTime)))
      .filter(_._2 < wmMs)
    assert(batchTol.exists(_._4.isEmpty), "fixture must exercise stale-match nulling")
    batchTol.foreach { case (k, _, id, v, rts) =>
      assert(gotTol.get((k, id)).contains((v, rts)),
        s"tolerance ($k,$id): stream ${gotTol.get((k, id))} != batch ${(v, rts)}")
    }
  }
}
