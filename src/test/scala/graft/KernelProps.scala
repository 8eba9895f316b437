package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.codec.{ChunkBlob, Lttb}
import graft.kernel.{Cc, Fft, Signal}

/** ScalaCheck property gates promised in SURVEY.md §5.2 — pure kernel and
  * codec laws over generated inputs (sbt runs ScalaCheck Properties
  * natively alongside ScalaTest).
  */
object KernelProps extends Properties("kernel") {

  private val vec: Gen[Array[Double]] = for {
    n <- Gen.choose(2, 128)
    xs <- Gen.listOfN(n, Gen.choose(-1e3, 1e3))
  } yield xs.toArray

  private val vecPair: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.choose(2, 128)
    xs <- Gen.listOfN(n, Gen.choose(-1e3, 1e3))
    ys <- Gen.listOfN(n, Gen.choose(-1e3, 1e3))
  } yield (xs.toArray, ys.toArray)

  property("cc antisymmetry: Rxy(k) == Ryx(-k)") = Prop.forAll(vecPair) { case (x, y) =>
    val rxy = Cc.cc(x, y, normalize = false)
    val ryx = Cc.cc(y, x, normalize = false)
    val nn = rxy.length
    val scale = rxy.map(math.abs).max.max(1.0)
    (0 until nn).forall(i => math.abs(rxy(i) - ryx(nn - 1 - i)) <= 1e-9 * scale)
  }

  property("normalized cc bounded: |Rxy| <= 1 + 1e-9") = Prop.forAll(vecPair) { case (x, y) =>
    Cc.cc(x, y, normalize = true).forall(v => math.abs(v) <= 1.0 + 1e-9)
  }

  property("unbias weights symmetric with center 1") = Prop.forAll(Gen.choose(2, 500)) { n =>
    val w = Cc.weight(n)
    val nn = w.length
    w(nn / 2) == 1.0 && (0 until nn).forall(i => w(i) == w(nn - 1 - i))
  }

  property("fft round-trip: ifft(fft(x)) == x at 1e-9") = Prop.forAll(vec) { x =>
    val re = java.util.Arrays.copyOf(x, x.length)
    val im = new Array[Double](x.length)
    Fft.fft(re, im)
    Fft.ifft(re, im)
    val scale = x.map(math.abs).max.max(1.0)
    x.indices.forall(i => math.abs(re(i) - x(i)) <= 1e-9 * scale && math.abs(im(i)) <= 1e-9 * scale)
  }

  property("Parseval: sum|x|^2 == (1/n) sum|X|^2 at 1e-9") = Prop.forAll(vec) { x =>
    val re = java.util.Arrays.copyOf(x, x.length)
    val im = new Array[Double](x.length)
    Fft.fft(re, im)
    val t = x.map(v => v * v).sum
    val f = re.indices.map(i => re(i) * re(i) + im(i) * im(i)).sum / x.length
    math.abs(t - f) <= 1e-9 * math.max(t, 1.0)
  }

  property("taper: interior untouched, magnitude never grows") = Prop.forAll(vec) { x =>
    val out = Signal.taper(x, maxPercentage = 0.2)
    val m = (math.min(0.2, 0.5) * x.length).toInt
    out.length == x.length &&
      (m until x.length - m).forall(i => out(i) == x(i)) &&
      x.indices.forall(i => math.abs(out(i)) <= math.abs(x(i)) + 1e-12)
  }

  property("lanczos identity at ratio 1 / offset 0") = Prop.forAll(vec) { x =>
    val out = Signal.lanczosResample(x, ratio = 1.0, offsetSamples = 0.0, nOut = x.length)
    val scale = x.map(math.abs).max.max(1.0)
    x.indices.forall(i => math.abs(out(i) - x(i)) <= 1e-9 * scale)
  }

  // ---- codecs: bit-exact round-trips over hostile doubles

  private val hostile: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e300, 1e300),
    Gen.oneOf(Double.NaN, 0.0, -0.0, Double.MinPositiveValue,
      Double.MaxValue, -Double.MaxValue, Double.PositiveInfinity,
      Double.NegativeInfinity, 4.9e-324))

  private val chunk: Gen[(Array[Long], Array[Double])] = for {
    n <- Gen.choose(1, 300)
    start <- Gen.choose(0L, 1L << 50)
    deltas <- Gen.listOfN(n - 1, Gen.choose(1L, 1L << 32))
    vs <- Gen.listOfN(n, hostile)
  } yield (deltas.scanLeft(start)(_ + _).toArray, vs.toArray)

  property("ChunkBlob round-trip is BIT-exact (delta-of-delta + Gorilla)") =
    Prop.forAll(chunk) { case (ts, vs) =>
      val (t2, v2) = ChunkBlob.decode(ChunkBlob.encode(ts, vs))
      t2.sameElements(ts) && v2.length == vs.length &&
        vs.indices.forall(i =>
          java.lang.Double.doubleToRawLongBits(v2(i)) == java.lang.Double.doubleToRawLongBits(vs(i)))
    }

  private val lttbIn: Gen[(Array[Long], Array[Double], Int)] = for {
    n <- Gen.choose(1, 400)
    start <- Gen.choose(0L, 1L << 40)
    deltas <- Gen.listOfN(n - 1, Gen.choose(1L, 1000000L))
    vs <- Gen.listOfN(n, Gen.choose(-1e6, 1e6))
    thr <- Gen.choose(3, 100)
  } yield (deltas.scanLeft(start)(_ + _).toArray, vs.toArray, thr)

  property("LTTB: size min(threshold, n); keeps first/last; subset of input") =
    Prop.forAll(lttbIn) { case (ts, vs, thr) =>
      val (dt, dv) = Lttb.downsample(ts, vs, thr)
      val pts = ts.zip(vs).toSet
      dt.length == math.min(thr, ts.length) &&
        dt.head == ts.head && dt.last == ts.last &&
        dt.zip(dv).forall(pts.contains)
    }
}
