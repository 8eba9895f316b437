package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Signal2d

class Signal2dSpec extends AnyFunSuite {

  test("cc2d: 2-D autocorrelation of a pattern peaks at zero shift with value 1") {
    val rng = new java.util.Random(8)
    val x = Array.fill(6, 9)(rng.nextGaussian())
    val r = Signal2d.cc2d(x, x, normalize = true)
    val (d1, d2, mx) = Signal2d.extractShift2d(r)
    assert(d1 == 0.0 && d2 == 0.0)
    assert(math.abs(mx - 1.0) < 1e-12)
  }

  test("cc2d: shifted copy recovered at the right 2-D lag") {
    val n1 = 8; val n2 = 12
    val rng = new java.util.Random(9)
    val x = Array.fill(n1, n2)(rng.nextGaussian())
    // y[i][j] = x[i-2][j-3] (zero elsewhere)
    val y = Array.tabulate(n1, n2)((i, j) =>
      if (i >= 2 && j >= 3) x(i - 2)(j - 3) else 0.0)
    val r = Signal2d.cc2d(x, y, normalize = true)
    val (d1, d2, _) = Signal2d.extractShift2d(r)
    assert(d1 == -2.0 && d2 == -3.0, s"got ($d1, $d2)")
  }

  test("cc2d matches direct 2-D sum at a few lags (unnormalized)") {
    val rng = new java.util.Random(10)
    val x = Array.fill(4, 5)(rng.nextGaussian())
    val y = Array.fill(4, 5)(rng.nextGaussian())
    val r = Signal2d.cc2d(x, y, normalize = false)
    val z1 = r.length / 2; val z2 = r(0).length / 2
    for (k1 <- -2 to 2; k2 <- -2 to 2) {
      var want = 0.0
      for (i <- 0 until 4; j <- 0 until 5) {
        val ii = i - k1; val jj = j - k2
        if (ii >= 0 && ii < 4 && jj >= 0 && jj < 5) want += x(i)(j) * y(ii)(jj)
      }
      val got = r(z1 + k1)(z2 + k2)
      assert(math.abs(got - want) < 1e-9, s"lag ($k1,$k2): $got vs $want")
    }
  }

  test("peakLocalMax finds isolated maxima in descending order") {
    val a = Array.ofDim[Double](10, 10)
    a(2)(3) = 5.0
    a(7)(8) = 9.0
    a(5)(5) = 1.0
    val peaks = Signal2d.peakLocalMax(a, minDistance = 1, thresholdRel = 0.05)
    assert(peaks.take(2) == Seq((7, 8, 9.0), (2, 3, 5.0)))
  }

  test("lombscargle peaks at the true frequency for irregular sampling") {
    val rng = new java.util.Random(11)
    val t = (0 until 300).map(_ => rng.nextDouble() * 100).sorted.toArray
    val f0 = 0.7 // Hz
    val y = t.map(ti => math.sin(2 * math.Pi * f0 * ti))
    val freqs = (1 to 150).map(k => 2 * math.Pi * k * 0.01).toArray // 0.01..1.5 Hz angular
    val p = Signal2d.lombscargle(t, y, freqs)
    val best = freqs(p.indexOf(p.max)) / (2 * math.Pi)
    assert(math.abs(best - f0) < 0.02, s"peak at $best Hz")
  }
}
