package graft.kernel

import java.util.concurrent.ConcurrentHashMap

/** Pure-Scala double-precision FFT: iterative radix-2 for power-of-two sizes
  * and Bluestein's chirp-z for arbitrary sizes (the cross-correlation pad
  * length 2n-1 is odd — see the reference's pad rule,
  * /root/reference/xcorr/util/cc.py:66-71).
  *
  * Plans (twiddle tables, chirp vectors, pre-transformed chirp spectra) are
  * cached per length in a JVM-wide ConcurrentHashMap so that a Spark
  * `mapPartitions` kernel re-running the same window length pays the setup
  * cost once per executor, not once per row.
  */
object Fft {

  /** Twiddle table for a power-of-two size: w[j] = exp(-2*pi*i*j/n), j < n/2. */
  private final class Pow2Plan(val n: Int) {
    val cos = new Array[Double](n / 2)
    val sin = new Array[Double](n / 2)
    locally {
      var j = 0
      while (j < n / 2) {
        val ang = -2.0 * math.Pi * j / n
        cos(j) = math.cos(ang)
        sin(j) = math.sin(ang)
        j += 1
      }
    }
  }

  private final class BluesteinPlan(val n: Int) {
    val m: Int = Integer.highestOneBit(2 * n) * 2 match {
      case mm if mm >= 2 * n + 1 => mm
      case mm                    => mm * 2
    }
    // chirp c[k] = exp(-i*pi*k^2/n); angle computed with k^2 mod 2n in Long
    // arithmetic to keep the argument small (precision at large n).
    val cCos = new Array[Double](n)
    val cSin = new Array[Double](n)
    locally {
      var k = 0
      while (k < n) {
        val kk = (k.toLong * k) % (2L * n)
        val ang = -math.Pi * kk / n
        cCos(k) = math.cos(ang)
        cSin(k) = math.sin(ang)
        k += 1
      }
    }
    // B = fft(b) where b[0]=c[0], b[k]=b[m-k]=conj(c[k])
    val bRe = new Array[Double](m)
    val bIm = new Array[Double](m)
    locally {
      // b[k] = conj(c[k]) = cos - i*sin (c stored as cos + i*sin)
      bRe(0) = cCos(0); bIm(0) = -cSin(0)
      var k = 1
      while (k < n) {
        bRe(k) = cCos(k); bIm(k) = -cSin(k)
        bRe(m - k) = cCos(k); bIm(m - k) = -cSin(k)
        k += 1
      }
      transformPow2(bRe, bIm, inverse = false)
    }
  }

  private val pow2Plans = new ConcurrentHashMap[Int, Pow2Plan]()
  private val bluePlans = new ConcurrentHashMap[Int, BluesteinPlan]()

  /** Per-thread reusable scratch (re, im) pairs keyed by length — the CC
    * kernel runs millions of same-length transforms per executor, and
    * allocating ~1 MB of arrays per call dominated GC (SURVEY.md §4:
    * "allocation-lean, reused scratch buffers per partition").
    */
  private val scratchTL = ThreadLocal.withInitial(
    () => new java.util.HashMap[Int, (Array[Double], Array[Double])]())

  private[kernel] def scratch(n: Int): (Array[Double], Array[Double]) = {
    val m = scratchTL.get()
    var s = m.get(n)
    if (s == null) {
      s = (new Array[Double](n), new Array[Double](n))
      m.put(n, s)
    }
    s
  }

  private def pow2Plan(n: Int): Pow2Plan =
    pow2Plans.computeIfAbsent(n, k => new Pow2Plan(k))
  private def bluePlan(n: Int): BluesteinPlan =
    bluePlans.computeIfAbsent(n, k => new BluesteinPlan(k))

  def isPow2(n: Int): Boolean = n > 0 && (n & (n - 1)) == 0

  /** In-place radix-2 FFT; n must be a power of two. No output scaling
    * (inverse is scaled by the caller).
    */
  private def transformPow2(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    if (n <= 1) return
    val plan = pow2Plan(n)
    // bit-reverse permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        var t = re(i); re(i) = re(j); re(j) = t
        t = im(i); im(i) = im(j); im(j) = t
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val step = n / len
      val half = len >> 1
      var blk = 0
      while (blk < n) {
        var k = 0
        var tw = 0
        while (k < half) {
          val wr = plan.cos(tw)
          val wi = if (inverse) -plan.sin(tw) else plan.sin(tw)
          val i0 = blk + k
          val i1 = i0 + half
          val xr = re(i1) * wr - im(i1) * wi
          val xi = re(i1) * wi + im(i1) * wr
          re(i1) = re(i0) - xr
          im(i1) = im(i0) - xi
          re(i0) += xr
          im(i0) += xi
          k += 1
          tw += step
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Forward DFT, in place for power-of-two n; for arbitrary n the arrays are
    * overwritten with the transform (Bluestein internally uses scratch).
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(im.length == n, "re/im length mismatch")
    if (isPow2(n)) transformPow2(re, im, inverse = false)
    else bluestein(re, im)
  }

  /** Inverse DFT with 1/n scaling (numpy.fft.ifft semantics). */
  def ifft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // ifft(x) = conj(fft(conj(x))) / n
    var i = 0
    while (i < n) { im(i) = -im(i); i += 1 }
    fft(re, im)
    val s = 1.0 / n
    i = 0
    while (i < n) { re(i) *= s; im(i) = -im(i) * s; i += 1 }
  }

  /** Bluestein chirp-z transform for arbitrary n (forward only). Uses
    * per-thread scratch for the size-m convolution buffers (zeroed here —
    * every element is overwritten for k < n and must be 0 above).
    */
  private def bluestein(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    val p = bluePlan(n)
    val m = p.m
    val (aRe, aIm) = Fft.scratch(m)
    java.util.Arrays.fill(aRe, 0.0)
    java.util.Arrays.fill(aIm, 0.0)
    var k = 0
    while (k < n) {
      // a[k] = x[k] * c[k]
      aRe(k) = re(k) * p.cCos(k) - im(k) * p.cSin(k)
      aIm(k) = re(k) * p.cSin(k) + im(k) * p.cCos(k)
      k += 1
    }
    transformPow2(aRe, aIm, inverse = false)
    // pointwise multiply with pre-transformed B
    k = 0
    while (k < m) {
      val r = aRe(k) * p.bRe(k) - aIm(k) * p.bIm(k)
      val s = aRe(k) * p.bIm(k) + aIm(k) * p.bRe(k)
      aRe(k) = r
      aIm(k) = s
      k += 1
    }
    // inverse pow2 transform with 1/m scaling
    k = 0
    while (k < m) { aIm(k) = -aIm(k); k += 1 }
    transformPow2(aRe, aIm, inverse = false)
    val s = 1.0 / m
    k = 0
    while (k < n) {
      val cr = aRe(k) * s
      val ci = -aIm(k) * s
      // y[k] = c[k] * conv[k]
      re(k) = cr * p.cCos(k) - ci * p.cSin(k)
      im(k) = cr * p.cSin(k) + ci * p.cCos(k)
      k += 1
    }
  }

  /** numpy.fft.fftshift for a 1-D array: move zero-frequency to the center. */
  def fftshift(a: Array[Double]): Array[Double] = {
    val n = a.length
    val h = (n + 1) / 2
    val out = new Array[Double](n)
    System.arraycopy(a, h, out, 0, n - h)
    System.arraycopy(a, 0, out, n - h, h)
    out
  }

  /** numpy.fft.fftfreq(n, d): [0, 1, ..., (n-1)/2, -(n/2), ..., -1] / (n*d). */
  def fftfreq(n: Int, d: Double): Array[Double] = {
    val out = new Array[Double](n)
    val s = 1.0 / (n * d)
    val half = (n - 1) / 2
    var i = 0
    while (i <= half) { out(i) = i * s; i += 1 }
    var neg = -(n / 2)
    while (i < n) { out(i) = neg * s; i += 1; neg += 1 }
    out
  }

  /** Real FFT: returns (re, im) of length n/2+1 (numpy.fft.rfft). */
  def rfft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = java.util.Arrays.copyOf(x, n)
    val im = new Array[Double](n)
    fft(re, im)
    val h = n / 2 + 1
    (java.util.Arrays.copyOf(re, h), java.util.Arrays.copyOf(im, h))
  }

  /** Inverse real FFT back to length n (numpy.fft.irfft with explicit n). */
  def irfft(re: Array[Double], im: Array[Double], n: Int): Array[Double] = {
    val fullRe = new Array[Double](n)
    val fullIm = new Array[Double](n)
    val h = re.length // n/2+1
    var i = 0
    while (i < h && i < n) { fullRe(i) = re(i); fullIm(i) = im(i); i += 1 }
    i = 1
    while (i < h) {
      val j = n - i
      if (j >= h) { fullRe(j) = re(i); fullIm(j) = -im(i) }
      i += 1
    }
    ifft(fullRe, fullIm)
    fullRe
  }
}
