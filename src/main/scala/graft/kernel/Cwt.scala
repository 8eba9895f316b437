package graft.kernel

/** Continuous wavelet transform with a complex Morlet wavelet — the
  * reference's cwt/scaleogram (/root/reference/xcorr/signal/cwt.py:28-261:
  * pywt cmor wavelet, log-spaced scales, scaleogram = |cwt| cropped to a
  * frequency band). Implemented as FFT-domain convolution per scale
  * (O(n log n) per scale), double precision.
  *
  * Morlet (cmorB-C convention): psi(t) = (pi*B)^(-1/2) exp(2*pi*i*C*t)
  * exp(-t^2/B) with bandwidth B and center frequency C; a scale `a` maps to
  * pseudo-frequency f = C / (a * delta).
  */
object Cwt {

  /** @return (nScales x n) matrix of |CWT| magnitudes and the
    *         pseudo-frequency axis.
    */
  def scaleogram(
      x: Array[Double],
      delta: Double,
      scales: Array[Double],
      bandwidth: Double = 1.5,
      centerFreq: Double = 1.0
  ): (Array[Array[Double]], Array[Double]) = {
    val n = x.length
    val m = Integer.highestOneBit(math.max(2 * n - 1, 2)) * 2
    // FFT of the (zero-padded) signal, once
    val xr = java.util.Arrays.copyOf(x, m)
    val xi = new Array[Double](m)
    Fft.fft(xr, xi)
    val out = Array.ofDim[Double](scales.length, n)
    val freqAxis = scales.map(a => centerFreq / (a * delta))
    var s = 0
    while (s < scales.length) {
      val a = scales(s)
      // wavelet spectrum sampled directly in the frequency domain:
      // FT of psi_a(t)/sqrt(a) at freq f is sqrt(a) * Psi(a f);
      // Psi(f) = exp(-pi^2 B (f - C)^2) (analytic, positive-f support)
      val wr = new Array[Double](m)
      val wi = new Array[Double](m)
      var k = 0
      while (k < m) {
        val f = (if (k <= m / 2) k else k - m) / (m * delta) // cycles/sec
        // pseudo-frequency relation: f = C / (a * delta) ⇒ match when
        // a * delta * f == C (dimensionless wavelet argument)
        val arg = a * delta * f - centerFreq
        val mag = math.exp(-math.Pi * math.Pi * bandwidth * arg * arg) * math.sqrt(a)
        // conv theorem: Y = X * conj(Psi(a f)) — Morlet spectrum is real
        wr(k) = xr(k) * mag
        wi(k) = xi(k) * mag
        k += 1
      }
      Fft.ifft(wr, wi)
      var i = 0
      while (i < n) { out(s)(i) = math.hypot(wr(i), wi(i)); i += 1 }
      s += 1
    }
    (out, freqAxis)
  }

  /** Log-spaced scales covering [fMin, fMax] (cwt.py default layout). */
  def logScales(fMin: Double, fMax: Double, nScales: Int, delta: Double, centerFreq: Double = 1.0): Array[Double] = {
    val aMax = centerFreq / (fMin * delta)
    val aMin = centerFreq / (fMax * delta)
    Array.tabulate(nScales)(i => aMin * math.pow(aMax / aMin, i.toDouble / (nScales - 1)))
  }
}
