package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec._

/** Codec gates per FIXTURES.md F6: exact round-trip for Gorilla /
  * delta-of-delta (incl. NaN, ±0.0, subnormals) and LTTB determinism.
  * Property-style tests use seeded generators (deterministic).
  */
class CodecSpec extends AnyFunSuite {

  test("BitWriter/BitReader round-trip mixed widths") {
    val w = new BitWriter()
    w.writeBits(0x5L, 3)
    w.writeBits(-1L, 64)
    w.writeBit(1)
    w.writeBits(0x1234567890abcdefL, 61)
    val r = new BitReader(w.toBytes)
    assert(r.readBits(3) == 0x5L)
    assert(r.readBits(64) == -1L)
    assert(r.readBit() == 1)
    assert(r.readBits(61) == (0x1234567890abcdefL & ((1L << 61) - 1)))
  }

  test("Gorilla round-trips special doubles bit-exactly") {
    val vals = Array(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, -Double.MinPositiveValue,
      1.0, 1.0, 1.0000000000000002, -1e308, 4.9e-324, 42.0, 42.0)
    val w = new BitWriter()
    Gorilla.encode(vals, w)
    val got = Gorilla.decode(new BitReader(w.toBytes), vals.length)
    vals.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(got(i)) ==
        java.lang.Double.doubleToRawLongBits(vals(i)), s"idx $i")
    }
  }

  test("Gorilla round-trips arbitrary doubles (seeded property)") {
    val rng = new java.util.Random(99)
    def sample(): Double = rng.nextInt(5) match {
      case 0 => rng.nextDouble() * 2e12 - 1e12
      case 1 => 0.0
      case 2 => -0.0
      case 3 => Double.NaN
      case _ => rng.nextDouble() * 2 - 1
    }
    (0 until 200).foreach { trial =>
      val a = Array.fill(rng.nextInt(60))(sample())
      val w = new BitWriter()
      Gorilla.encode(a, w)
      val got = Gorilla.decode(new BitReader(w.toBytes), a.length)
      a.indices.foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(got(i)) ==
          java.lang.Double.doubleToRawLongBits(a(i)), s"trial $trial idx $i")
      }
    }
  }

  test("DeltaOfDelta round-trips regular, bursty and negative-delta series") {
    val cases = Seq(
      Array.tabulate(100)(i => 1700000000000L + i * 60000L),              // regular
      Array(0L, 1L, 2L, 500L, 501L, 1000000L, 1000001L),                  // bursts
      Array(100L, 50L, 49L, -20L, Long.MinValue / 4, Long.MaxValue / 4),  // wild
      Array(42L),                                                          // singleton
      Array.empty[Long]
    )
    cases.foreach { ts =>
      val w = new BitWriter()
      DeltaOfDelta.encode(ts, w)
      val got = DeltaOfDelta.decode(new BitReader(w.toBytes), ts.length)
      assert(got.sameElements(ts))
    }
  }

  test("DeltaOfDelta round-trips arbitrary long series (seeded property)") {
    val rng = new java.util.Random(101)
    (0 until 200).foreach { trial =>
      val a = Array.fill(rng.nextInt(60))(rng.nextLong() % 1000000L)
      val w = new BitWriter()
      DeltaOfDelta.encode(a, w)
      assert(DeltaOfDelta.decode(new BitReader(w.toBytes), a.length).sameElements(a), s"trial $trial")
    }
  }

  test("ChunkBlob round-trip and compression on a regular grid") {
    val n = 1440 // one day of 1-minute points
    val ts = Array.tabulate(n)(i => 1700000000000L + i * 60000L)
    val rng = new java.util.Random(3)
    val values = Array.tabulate(n)(_ => (rng.nextInt(20)).toDouble)
    val blob = ChunkBlob.encode(ts, values)
    val (gotTs, gotV) = ChunkBlob.decode(blob)
    assert(gotTs.sameElements(ts))
    assert(gotV.sameElements(values))
    // regular timestamps compress to ~1 bit each; whole blob far below raw 16B/pt
    assert(blob.length < n * 8, s"blob ${blob.length}B for $n points")
  }

  test("LTTB keeps first/last, output sorted and within bounds") {
    val n = 1000
    val ts = Array.tabulate(n)(i => i.toLong * 1000)
    val rng = new java.util.Random(5)
    val v = Array.tabulate(n)(_ => rng.nextGaussian())
    val (dts, dv) = Lttb.downsample(ts, v, 100)
    assert(dts.length == 100)
    assert(dts.head == ts.head && dts.last == ts.last)
    assert(dts.sliding(2).forall(p => p(0) < p(1)))
    assert(dv.forall(x => v.contains(x)))
  }

  test("LTTB passthrough when threshold >= n") {
    val ts = Array.tabulate(10)(_.toLong)
    val v = Array.tabulate(10)(_.toDouble)
    val (dts, dv) = Lttb.downsample(ts, v, 50)
    assert(dts.sameElements(ts) && dv.sameElements(v))
  }

  test("LTTB picks the obvious spike") {
    // flat line with one spike: the spike's bucket must select the spike
    val n = 300
    val ts = Array.tabulate(n)(_.toLong)
    val v = Array.fill(n)(0.0)
    v(150) = 100.0
    val (_, dv) = Lttb.downsample(ts, v, 30)
    assert(dv.contains(100.0))
  }
}
