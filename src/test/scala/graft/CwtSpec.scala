package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Cwt

class CwtSpec extends AnyFunSuite {

  test("scaleogram ridge tracks the tone frequency") {
    val fs = 100.0
    val n = 2048
    val f0 = 8.0
    val x = Array.tabulate(n)(i => math.cos(2 * math.Pi * f0 * i / fs))
    val scales = Cwt.logScales(2.0, 30.0, 40, 1 / fs)
    val (mag, freqs) = Cwt.scaleogram(x, 1 / fs, scales)
    // at the center of the signal, the scale with max energy should map to ~f0
    val mid = n / 2
    val ridge = freqs(mag.indices.maxBy(s => mag(s)(mid)))
    assert(math.abs(ridge - f0) / f0 < 0.1, s"ridge at $ridge Hz")
  }

  test("pywt-algorithm path: ridge matches the spectral path and the tone") {
    val fs = 100.0
    val n = 2048
    val f0 = 8.0
    val x = Array.tabulate(n)(i => math.cos(2 * math.Pi * f0 * i / fs))
    val scales = Cwt.logScales(2.0, 30.0, 40, 1 / fs)
    val (magP, freqsP) = Cwt.scaleogramPywt(x, 1 / fs, scales)
    val (magS, freqsS) = Cwt.scaleogram(x, 1 / fs, scales)
    val mid = n / 2
    val ridgeP = freqsP(magP.indices.maxBy(s => magP(s)(mid)))
    val ridgeS = freqsS(magS.indices.maxBy(s => magS(s)(mid)))
    assert(math.abs(ridgeP - f0) / f0 < 0.1, s"pywt-path ridge at $ridgeP Hz")
    assert(math.abs(ridgeP - ridgeS) / f0 < 0.1,
      s"two independent CWT algorithms disagree: $ridgeP vs $ridgeS")
    // interior magnitudes of the two algorithms agree in SHAPE along the
    // scale axis: normalized ridge-column profiles correlate strongly
    val colP = magP.map(_(mid))
    val colS = magS.map(_(mid))
    def norm(v: Array[Double]) = { val m = v.max; v.map(_ / m) }
    val (a, b) = (norm(colP), norm(colS))
    val corr = a.zip(b).map { case (u, v) => u * v }.sum /
      math.sqrt(a.map(u => u * u).sum * b.map(v => v * v).sum)
    assert(corr > 0.97, s"profile correlation $corr")
  }

  test("chirp: ridge frequency increases along time") {
    val fs = 100.0
    val n = 4096
    // linear chirp 4 -> 20 Hz
    val x = Array.tabulate(n) { i =>
      val t = i / fs
      val f = 4.0 + (20.0 - 4.0) * i / n
      math.cos(2 * math.Pi * f * t / 2)
    }
    val scales = Cwt.logScales(2.0, 30.0, 48, 1 / fs)
    val (mag, freqs) = Cwt.scaleogram(x, 1 / fs, scales)
    def ridge(i: Int) = freqs(mag.indices.maxBy(s => mag(s)(i)))
    assert(ridge(n / 4) < ridge(3 * n / 4), s"${ridge(n / 4)} !< ${ridge(3 * n / 4)}")
  }
}
