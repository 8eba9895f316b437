package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule: the same jobs on the
  * same deterministic input at N=8 and 4N=32 local cores (the sandbox
  * stand-in for N vs 4N executors — no real cluster here), reporting
  * throughput at both levels + efficiency in BENCH/BASELINE.md.
  *
  * Measurement methodology (round 4 — variance-proofed): this VM's
  * attainable throughput drifts ±20%+ over minutes, so a control measured
  * once per run cannot be compared with a job measured minutes away (the
  * r3 controls swung 0.60→0.87 across same-binary runs). Here every job
  * run is BRACKETED by its own hardware control (control, job, control —
  * A/B/A within one drift regime, at each core count, every visit), the
  * per-VISIT engine-vs-floor ratio divides quantities measured seconds
  * apart, and the shipped number is the MEDIAN ratio over >= 3 visits with
  * its spread (max-min)/2 as the confidence band.
  *
  * Three jobs × two floors, matched by resource profile:
  *  - CC kernel stage (scan -> mapPartitions FFT -> count): floor =
  *    [[kernelMemCeiling]] — bare threads running the IDENTICAL per-row
  *    work (float32 window pairs streamed from thread-private cache-busting
  *    memory, converted, FFT-correlated), i.e. the job minus Spark. The
  *    old shared-input cache-resident FFT burn ([[kernelCeiling]]) is kept
  *    as a secondary reference but overstates what a memory-touching job
  *    can attain, which is why r3's kernel-vs-floor ratio was noisy.
  *  - e2e CC production: same floor (optimistic for e2e — it also
  *    shuffles; stated in the report).
  *  - rollup (ingest -> tier-1): floor = [[memCeiling]] — private-array
  *    streaming, the memory-bandwidth wall a row-streaming job tops out
  *    at in one JVM.
  */
object Scaling {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // rows carry 2 × npts float arrays: the default 4096-row vectorized
      // batch is ~100 MB per column per task — size batches for array-wide
      // rows (same knob a real cluster would set for this table shape)
      .config("spark.sql.parquet.columnarReaderBatchSize", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  final case class M(cells: Long, secs: Double) { def pps: Double = cells / secs }

  /** Cache-resident FFT burn (shared input, zero memory traffic) — the
    * round-1..3 control, kept as a secondary reference point only: it
    * bounds pure-compute thread scaling but no job that streams rows can
    * match it.
    */
  def kernelCeiling(threads: Int): Double = {
    import graft.kernel.Cc
    val rng = new java.util.Random(1)
    val x = Array.fill(2880)(rng.nextGaussian())
    val y = Array.fill(2880)(rng.nextGaussian())
    Cc.cc(x, y)
    val per = 3840 / threads
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      new Thread(() => { var i = 0; while (i < per) { Cc.cc(x, y); i += 1 } })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    threads.toLong * per / ((System.nanoTime() - t0) / 1e9)
  }

  /** The kernel job's FAITHFUL floor: bare threads, each streaming its OWN
    * cache-busting set of float32 window pairs (2880 samples, the job's
    * npts at 10 s step / 8 h window), converting to double and running the
    * identical `Cc.cc(normalize) + extractShiftAndMax` per pair — the
    * Spark kernel stage minus Spark (scan/decode modeled by the private-
    * memory float reads). cc windows / sec, directly comparable to the
    * job's throughput unit.
    */
  def kernelMemCeiling(threads: Int): Double = {
    import graft.kernel.Cc
    val npts = 2880
    val pairsPerThread = 192 // 2 × 2880 floats × 192 ≈ 4.4 MB/thread — L2+ busting
    val all = Array.tabulate(threads) { t =>
      val rng = new java.util.Random(1000 + t)
      Array.fill(pairsPerThread)((
        Array.fill(npts)(rng.nextFloat()),
        Array.fill(npts)(rng.nextFloat())))
    }
    def toD(f: Array[Float]): Array[Double] = {
      val d = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { d(i) = f(i).toDouble; i += 1 }
      d
    }
    val passes = math.max(1, 20 * 8 / threads) // ~constant total work per level
    val sink = new java.util.concurrent.atomic.LongAdder
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        val mine = all(t)
        var p = 0
        var acc = 0.0
        while (p < passes) {
          var i = 0
          while (i < pairsPerThread) {
            val rxy = Cc.cc(toD(mine(i)._1), toD(mine(i)._2), normalize = true)
            acc += Cc.extractShiftAndMax(rxy, 10.0)._2
            i += 1
          }
          p += 1
        }
        sink.add(java.lang.Double.doubleToRawLongBits(acc)) // defeat DCE
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    threads.toLong * passes * pairsPerThread / ((System.nanoTime() - t0) / 1e9)
  }

  /** Pure-JVM memory-bandwidth ceiling: each thread streams a reduction
    * over its OWN 32 MB double array (cache-busting, zero sharing) — the
    * attainable 8→32 thread-scaling for bandwidth-bound work on this box,
    * i.e. the honest floor for the shuffle/memory-bound rollup job.
    */
  def memCeiling(threads: Int): Double = {
    val n = 4 << 20 // 4M doubles = 32 MB per thread
    val arrays = Array.fill(threads)(Array.tabulate(n)(i => i * 0.5 + 1.0))
    val sink = new java.util.concurrent.atomic.LongAdder
    val totalPasses = 192
    val per = totalPasses / threads
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        val a = arrays(t)
        var p = 0
        var acc = 0.0
        while (p < per) {
          var i = 0
          while (i < n) { acc += a(i); i += 1 }
          p += 1
        }
        sink.add(java.lang.Double.doubleToRawLongBits(acc)) // defeat DCE
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    threads.toLong * per * n * 8.0 / 1e9 / ((System.nanoTime() - t0) / 1e9)
  }

  /** One core-count level of one visit: the three jobs, each bracketed by
    * control PAIRS (see [[main]]'s methodology note), plus the absolute
    * floor throughputs at this level for the report tables.
    */
  final case class LevelMeas(
      kernel: M, e2e: M, rollup: M,
      kFloorAbs: Double, rFloorAbs: Double, kFft: Double)

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SCALE_CONVS", "4000").toInt
    val baseTurns = sys.env.getOrElse("SCALE_TURNS", "800").toInt
    val ccConvs = sys.env.getOrElse("SCALE_CC_CONVS", "600").toInt

    val rollupPath = s"/tmp/graft-scale-rollup-$nConvs-$baseTurns"
    val ccPath = s"/tmp/graft-scale-cc-$ccConvs"

    // "-f32": window arrays are float32-packed since round 2 — don't reuse
    // round-1 double-array caches under the old path
    val pwPath = s"/tmp/graft-scale-pairwins-f32-$ccConvs"

    // setup (untimed): materialize input tables + pre-joined pair-windows
    locally {
      val s = session(32)
      if (!new java.io.File(s"$rollupPath/_SUCCESS").exists())
        Bench.materializeTranscripts(s, nConvs, baseTurns, rollupPath)
      if (!new java.io.File(s"$ccPath/_SUCCESS").exists())
        Bench.materializeTranscripts(s, ccConvs, 1500, ccPath)
      if (!new java.io.File(s"$pwPath/_SUCCESS").exists())
        Bench.materializePairWindows(s, ccPath, pwPath, ccConvs)
      s.stop()
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }

    // Control pairs: the floors are pure-JVM thread burns, independent of
    // the live Spark session's core count — so each 8-vs-32 floor ratio is
    // measured BACK-TO-BACK (seconds apart, same drift regime), the one
    // place the r4-first-cut still carried minutes-scale drift (its
    // per-level floors paired measurements minutes apart and the floor
    // ratio swung ±0.08 while the job raw ratios held ±0.03). Pairs are
    // taken around every job block at both levels; the per-visit floor
    // efficiency is the MEDIAN pair ratio.
    val kFloorPairs = scala.collection.mutable.ArrayBuffer[Double]()
    val rFloorPairs = scala.collection.mutable.ArrayBuffer[Double]()
    def kPair(): (Double, Double) = {
      val c8 = kernelMemCeiling(8); val c32 = kernelMemCeiling(32)
      kFloorPairs += (c32 / c8) / 4.0
      (c8, c32)
    }
    def rPair(): (Double, Double) = {
      val c8 = memCeiling(8); val c32 = memCeiling(32)
      rFloorPairs += (c32 / c8) / 4.0
      (c8, c32)
    }

    def measureLevel(cores: Int): LevelMeas = {
      val spark = session(cores)
      // per-plan warmups: JIT + codegen + page-faults (each PLAN needs its
      // own warmup — best-of-2 below makes the first timed pass double as
      // the warmup for that plan's generated stages)
      Bench.rollupThroughput(spark, 64, 100)
      Bench.ccKernelThroughput(spark, pwPath)
      kernelMemCeiling(cores) // JIT the control loops too
      memCeiling(cores)
      def best2(f: => (Long, Double)): M = {
        val a = f; val b = f
        M(a._1, math.min(a._2, b._2))
      }
      kPair()
      val kFft = kernelCeiling(cores) // secondary reference only
      val k = best2(Bench.ccKernelThroughput(spark, pwPath))
      val kfAbs = kPair()
      val c = best2(Bench.ccThroughput(spark, ccPath, ccConvs,
        stepSec = 10, windowSec = 28800, strideSec = 14400, neighbors = 2))
      kPair()
      val rfAbs = rPair()
      val r = best2 { val (cl, _, sec) = Bench.rollupThroughput(spark, rollupPath); (cl, sec) }
      rPair()
      spark.stop()
      LevelMeas(k, c, r,
        if (cores == 8) kfAbs._1 else kfAbs._2,
        if (cores == 8) rfAbs._1 else rfAbs._2, kFft)
    }

    final case class VisitRatios(
        kRaw: Double, kFloorEff: Double, kRatio: Double,
        eRaw: Double, eFloorEff: Double, eRatio: Double,
        rRaw: Double, rFloorEff: Double, rRatio: Double)

    val visits = sys.env.getOrElse("SCALE_VISITS", "3").toInt
    val ms = (1 to visits).map { v =>
      println(s"[scaling] visit $v/$visits")
      kFloorPairs.clear(); rFloorPairs.clear()
      val m8 = measureLevel(8)
      val m32 = measureLevel(32)
      require(m8.kernel.cells == m32.kernel.cells &&
        m8.e2e.cells == m32.e2e.cells && m8.rollup.cells == m32.rollup.cells,
        "non-deterministic workload")
      (m8, m32, median(kFloorPairs.toSeq), median(rFloorPairs.toSeq))
    }
    val ratios = ms.map { case (m8, m32, kF, rF) =>
      def eff(a: Double, b: Double) = (b / a) / 4.0
      val kRaw = eff(m8.kernel.pps, m32.kernel.pps)
      val eRaw = eff(m8.e2e.pps, m32.e2e.pps)
      val rRaw = eff(m8.rollup.pps, m32.rollup.pps)
      VisitRatios(kRaw, kF, kRaw / kF, eRaw, kF, eRaw / kF, rRaw, rF, rRaw / rF)
    }
    def spread(xs: Seq[Double]): Double = (xs.max - xs.min) / 2
    def agg(f: VisitRatios => Double): (Double, Double) =
      (median(ratios.map(f)), spread(ratios.map(f)))

    val (kRawM, kRawS) = agg(_.kRaw)
    val (kRatM, kRatS) = agg(_.kRatio)
    val (eRawM, eRawS) = agg(_.eRaw)
    val (eRatM, eRatS) = agg(_.eRatio)
    val (rRawM, rRawS) = agg(_.rRaw)
    val (rRatM, rRatS) = agg(_.rRatio)
    val (kFm, _) = agg(_.kFloorEff)
    val (eFm, _) = agg(_.eFloorEff)
    val (rFm, _) = agg(_.rFloorEff)

    // representative absolute-throughput rows: the visit with the median
    // kernel ratio (absolute numbers are for scale context; the shipped
    // evidence is the ratio distribution)
    val repIdx = ratios.indexWhere(_.kRatio == median(ratios.map(_.kRatio))) match {
      case -1 => ratios.indices.minBy(i => math.abs(ratios(i).kRatio - kRatM))
      case i  => i
    }
    val (r8, r32, _, _) = ms(repIdx)

    def visitRows(f: VisitRatios => (Double, Double, Double)): String =
      ratios.zipWithIndex.map { case (r, i) =>
        val (raw, fl, rat) = f(r)
        f"| visit ${i + 1} | $raw%.3f | $fl%.3f | $rat%.3f |"
      }.mkString("\n")

    val md =
      f"""# BENCH — scaling evidence (north rule: efficiency >= 0.8 at N vs 4N)
         |
         |Sandbox stand-in for N vs 4N executors: local[8] vs local[32] on one
         |32-core box (no real cluster; per driver instruction). Inputs are
         |pre-materialized deterministic synthetic transcript tables (the
         |generator is partitioning-independent — asserted in PipelineSpec);
         |generation is setup, not measured.
         |
         |**Methodology (r4, variance-proofed)**: the floors are pure-JVM
         |thread burns independent of the live Spark session, so each 8-vs-32
         |floor ratio is measured BACK-TO-BACK (seconds apart — the same
         |drift regime; pairing floor levels minutes apart is what made the
         |r3 ratios swing 0.60-0.87). Floor pairs bracket every job block at
         |both core counts (6 kernel-floor + 4 mem-floor pairs per visit);
         |the per-visit floor efficiency is the MEDIAN pair ratio, the
         |per-visit engine-vs-floor ratio divides the visit's raw job
         |efficiency by it, and the shipped number is the median over $visits
         |interleaved visits with spread (max-min)/2 as the confidence band.
         |Controls are matched to each job's resource profile: the CC jobs'
         |floor is bare threads running the IDENTICAL per-window work
         |(float32 pairs streamed from thread-private cache-busting memory ->
         |convert -> normalized FFT CC + shift extract — the job minus Spark);
         |the rollup's floor is private-array memory streaming (the bandwidth
         |wall for row-streaming work in one JVM).
         |
         |## Job 1 — CC kernel stage (compute-bound, the inner production loop)
         |
         |pre-joined pair-windows table -> scan -> mapPartitions FFT CC
         |(normalize + shift extract) -> count. Zero shuffle; isolates how
         |the engine's hot kernel scales with cores.
         |
         |Representative absolutes (median-ratio visit):
         |
         || parallelism | cc windows | seconds | cc/sec | floor cc/sec (bare threads) |
         ||---|---|---|---|---|
         || local[8]  (N)  | ${r8.kernel.cells}%,d | ${r8.kernel.secs}%.1f | ${r8.kernel.pps}%,.1f | ${r8.kFloorAbs}%,.1f |
         || local[32] (4N) | ${r32.kernel.cells}%,d | ${r32.kernel.secs}%.1f | ${r32.kernel.pps}%,.1f | ${r32.kFloorAbs}%,.1f |
         |
         |Per-visit (raw eff | floor eff | engine-vs-floor ratio):
         |
         || visit | raw | floor | ratio |
         ||---|---|---|---|
         |${visitRows(r => (r.kRaw, r.kFloorEff, r.kRatio))}
         |
         |**Kernel: raw efficiency $kRawM%.3f ± $kRawS%.3f; floor efficiency $kFm%.3f;
         |engine-vs-floor $kRatM%.3f ± $kRatS%.3f** (target: ratio >= 0.85, spread <= 0.05)
         |
         |Secondary reference: the cache-resident shared-input FFT burn (the
         |r1-r3 control) attained ${r8.kFft}%,.0f cc/s @8 / ${r32.kFft}%,.0f @32 in the
         |median visit — it bounds pure-compute scaling but no job that
         |streams rows from memory can match it, which is why ratios against
         |it were noisy (r3: 0.65-0.96 across runs).
         |
         |## Job 1b — end-to-end CC production (ingest + windows + join + kernel)
         |
         |transcripts($ccConvs convs) -> gap-fill (10 s grid) -> 8 h windows,
         |4 h stride -> ring-paired convs -> mapPartitions FFT CC kernel.
         |Floor: same per-window bare-threads control — OPTIMISTIC for this
         |job (the floor does no shuffle/window-assembly, the job does), so
         |its ratio is a lower bound on engine quality.
         |
         || parallelism | cc windows | seconds | cc/sec | floor cc/sec |
         ||---|---|---|---|---|
         || local[8]  (N)  | ${r8.e2e.cells}%,d | ${r8.e2e.secs}%.1f | ${r8.e2e.pps}%,.1f | ${r8.kFloorAbs}%,.1f |
         || local[32] (4N) | ${r32.e2e.cells}%,d | ${r32.e2e.secs}%.1f | ${r32.e2e.pps}%,.1f | ${r32.kFloorAbs}%,.1f |
         |
         || visit | raw | floor | ratio |
         ||---|---|---|---|
         |${visitRows(r => (r.eRaw, r.eFloorEff, r.eRatio))}
         |
         |**e2e CC: raw efficiency $eRawM%.3f ± $eRawS%.3f; floor efficiency $eFm%.3f;
         |engine-vs-floor $eRatM%.3f ± $eRatS%.3f**
         |
         |## Job 2 — ingest -> tier-1 rollup (shuffle/memory-bound)
         |
         |transcripts($nConvs convs, ${nConvs / 100} hot x50) -> gap-filled 1 m
         |series -> tier-1 (1 m) rollup. Floor: private-array memory
         |streaming (GB/s) — bandwidth-bound work's attainable thread
         |scaling on this box.
         |
         || parallelism | tier-1 points | seconds | points/sec | floor GB/s |
         ||---|---|---|---|---|
         || local[8]  (N)  | ${r8.rollup.cells}%,d | ${r8.rollup.secs}%.1f | ${r8.rollup.pps}%,.0f | ${r8.rFloorAbs}%,.1f |
         || local[32] (4N) | ${r32.rollup.cells}%,d | ${r32.rollup.secs}%.1f | ${r32.rollup.pps}%,.0f | ${r32.rFloorAbs}%,.1f |
         |
         || visit | raw | floor | ratio |
         ||---|---|---|---|
         |${visitRows(r => (r.rRaw, r.rFloorEff, r.rRatio))}
         |
         |**Rollup: raw efficiency $rRawM%.3f ± $rRawS%.3f; floor efficiency $rFm%.3f;
         |engine-vs-floor $rRatM%.3f ± $rRatS%.3f**
         |
         |Caveat (single-box honesty): both "cluster sizes" share ONE JVM, one
         |memory bus and one shuffle substrate, so raw efficiencies top out on
         |shared-resource limits rather than cores (rollup @32 saturates at the
         |same ~absolute points/sec for 34.6M- and 138M-point inputs — a
         |bandwidth wall, not fixed overhead). The engine-vs-floor ratios —
         |same work, same memory behavior, minus Spark — are the signal that
         |transfers to a real 4x-executor cluster, where each executor brings
         |its own cores, clocks, memory bandwidth and shuffle disks and the
         |floors themselves scale near-linearly.
         |Skew handling (hot conv_ids spread by salted repartition before the
         |row-exploding stages) is in the measured path.
         |""".stripMargin

    Files.createDirectories(Paths.get("BENCH"))
    // preserve the hand-curated cross-round run-history section: fresh
    // tables replace the measured part, history survives re-runs
    val out = Paths.get("BENCH/BASELINE.md")
    val history =
      if (Files.exists(out)) {
        val old = Files.readString(out)
        val i = old.indexOf("## Run history")
        if (i >= 0) "\n" + old.substring(i) else ""
      } else ""
    Files.writeString(out, md + history)
    println(f"""{"kernel_raw_med":$kRawM%.3f,"kernel_raw_spread":$kRawS%.3f,"kernel_vs_floor_med":$kRatM%.3f,"kernel_vs_floor_spread":$kRatS%.3f,"e2e_raw_med":$eRawM%.3f,"e2e_raw_spread":$eRawS%.3f,"e2e_vs_floor_med":$eRatM%.3f,"e2e_vs_floor_spread":$eRatS%.3f,"rollup_raw_med":$rRawM%.3f,"rollup_raw_spread":$rRawS%.3f,"rollup_vs_floor_med":$rRatM%.3f,"rollup_vs_floor_spread":$rRatS%.3f,"visits":$visits}""")
  }
}
