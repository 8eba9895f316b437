package graft.kernel

/** Butterworth IIR design (bilinear transform on the analog prototype) and
  * zero-phase forward-backward filtering over second-order sections,
  * reproducing the semantics of the reference's `filter` operator
  * (/root/reference/xcorr/signal/filter.py:27-120: SOS design + sosfiltfilt,
  * zero-phase, order effectively doubled). Design math follows the public
  * textbook formulation (matched to scipy.signal.butter's parameterization:
  * Wn is the cutoff normalized to the Nyquist frequency).
  */
object Filter {

  /** One biquad: y[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2] - a1 y[n-1] - a2 y[n-2]. */
  final case class Sos(b0: Double, b1: Double, b2: Double, a1: Double, a2: Double)

  private case class Complex(re: Double, im: Double) {
    def +(o: Complex) = Complex(re + o.re, im + o.im)
    def -(o: Complex) = Complex(re - o.re, im - o.im)
    def *(o: Complex) = Complex(re * o.re - im * o.im, re * o.im + im * o.re)
    def /(o: Complex) = {
      val d = o.re * o.re + o.im * o.im
      Complex((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
    def *(s: Double) = Complex(re * s, im * s)
    def conj = Complex(re, -im)
    def abs2: Double = re * re + im * im
  }
  private val One = Complex(1, 0)

  /** Design a digital Butterworth filter as second-order sections.
    *
    * @param order filter order
    * @param wn    critical frequency(ies) normalized to Nyquist (0 < wn < 1);
    *              one value for lowpass/highpass, two for bandpass/bandstop
    * @param btype "lowpass" | "highpass" | "bandpass" | "bandstop"
    */
  def butter(order: Int, wn: Array[Double], btype: String): Array[Sos] = {
    require(order >= 1)
    // analog Butterworth prototype: poles on the unit circle, left half-plane
    val protoPoles = (1 to order).map { k =>
      val theta = math.Pi * (2 * k + order - 1) / (2.0 * order)
      Complex(math.cos(theta), math.sin(theta))
    }.toArray
    val fs = 2.0
    btype match {
      case "lowpass" | "highpass" =>
        require(wn.length == 1)
        val warped = 2 * fs * math.tan(math.Pi * wn(0) / fs)
        if (btype == "lowpass") {
          val poles = protoPoles.map(_ * warped)
          val gain = math.pow(warped, order)
          bilinearToSos(Array.empty, poles, gain, fs)
        } else {
          // lp2hp: z' = wo/p for each pole; zeros at 0 (order of them)
          val poles = protoPoles.map(p => Complex(warped, 0) / p)
          // gain: k * real(prod(-p)/prod(-z)); prototype has no zeros,
          // lp2hp gain = k * real(prod(-poles_proto)) / ... for Butterworth
          // prod(-p_proto) = 1 (poles on unit circle, product of magnitudes 1,
          // real by conjugate symmetry)
          val zeros = Array.fill(order)(Complex(0, 0))
          val gain = 1.0
          bilinearToSos(zeros, poles, gain, fs)
        }
      case "bandpass" | "bandstop" =>
        require(wn.length == 2)
        val w1 = 2 * fs * math.tan(math.Pi * wn(0) / fs)
        val w2 = 2 * fs * math.tan(math.Pi * wn(1) / fs)
        val bw = w2 - w1
        val wo = math.sqrt(w1 * w2)
        if (btype == "bandpass") {
          // lp2bp: each pole p -> p*bw/2 ± sqrt((p*bw/2)^2 - wo^2)
          val poles = protoPoles.flatMap { p =>
            val pb = p * (bw / 2)
            val disc = csqrt(pb * pb - Complex(wo * wo, 0))
            Array(pb + disc, pb - disc)
          }
          val zeros = Array.fill(order)(Complex(0, 0))
          val gain = math.pow(bw, order)
          bilinearToSos(zeros, poles, gain, fs)
        } else {
          // lp2bs: poles -> (bw/2)/p ± sqrt(((bw/2)/p)^2 - wo^2); zeros ±i*wo
          val poles = protoPoles.flatMap { p =>
            val pb = Complex(bw / 2, 0) / p
            val disc = csqrt(pb * pb - Complex(wo * wo, 0))
            Array(pb + disc, pb - disc)
          }
          val zeros = (1 to order).flatMap(_ => Array(Complex(0, wo), Complex(0, -wo))).toArray
          val gain = 1.0 // prod(-p_proto)/prod(-z_proto) real part = 1 for Butterworth
          bilinearToSos(zeros, poles, gain, fs)
        }
      case other => throw new IllegalArgumentException(s"unknown btype: $other")
    }
  }

  private def csqrt(c: Complex): Complex = {
    val r = math.sqrt(c.abs2)
    val m = math.sqrt(math.sqrt(c.abs2))
    if (r == 0) return Complex(0, 0)
    val theta = math.atan2(c.im, c.re) / 2
    Complex(m * math.cos(theta), m * math.sin(theta))
  }

  /** Bilinear transform zpk -> digital zpk, then pair into SOS. */
  private def bilinearToSos(zeros: Array[Complex], poles: Array[Complex], gain: Double, fs: Double): Array[Sos] = {
    val fs2 = Complex(2 * fs, 0)
    val zD = zeros.map(z => (fs2 + z) / (fs2 - z))
    val pD = poles.map(p => (fs2 + p) / (fs2 - p))
    // gain update: k * real( prod(fs2 - z) / prod(fs2 - p) )
    var num = One
    zeros.foreach(z => num = num * (fs2 - z))
    var den = One
    poles.foreach(p => den = den * (fs2 - p))
    val kD = gain * (num / den).re
    // pad zeros at z = -1 up to pole count (bilinear maps infinity to -1)
    val zAll = zD ++ Array.fill(pD.length - zD.length)(Complex(-1, 0))
    toSos(zAll, pD, kD)
  }

  /** Pair conjugate poles/zeros into biquads (gain folded into the first). */
  private def toSos(zeros: Array[Complex], poles: Array[Complex], gain: Double): Array[Sos] = {
    // group into conjugate pairs (+ at most one real singleton each)
    def pairUp(cs: Array[Complex]): Array[(Complex, Option[Complex])] = {
      val used = new Array[Boolean](cs.length)
      val out = scala.collection.mutable.ArrayBuffer[(Complex, Option[Complex])]()
      // sort for determinism: by (im magnitude desc, re)
      val order = cs.indices.sortBy(i => (-math.abs(cs(i).im), cs(i).re, cs(i).im))
      for (i <- order if !used(i)) {
        used(i) = true
        val c = cs(i)
        if (math.abs(c.im) > 1e-14) {
          // find its conjugate
          val j = cs.indices.find(j => !used(j) && math.abs(cs(j).re - c.re) < 1e-9 && math.abs(cs(j).im + c.im) < 1e-9)
          j.foreach(used(_) = true)
          out += ((c, j.map(cs)))
        } else {
          // real: pair with the next unused real if any
          val j = order.find(j => !used(j) && math.abs(cs(j).im) <= 1e-14)
          j.foreach(used(_) = true)
          out += ((c, j.map(cs)))
        }
      }
      out.toArray
    }
    val pPairs = pairUp(poles)
    val zPairs = pairUp(zeros)
    val n = math.max(pPairs.length, zPairs.length)
    val sections = (0 until n).map { i =>
      val (num1, num2) = if (i < zPairs.length) zPairs(i) else (Complex(-1, 0), None)
      val (den1, den2) = pPairs(i)
      // (1 - z1 q)(1 - z2 q) in z^-1 form -> b = [1, -(z1+z2), z1*z2]
      def coeffs(c1: Complex, c2: Option[Complex]): (Double, Double, Double) = c2 match {
        case Some(c2v) => (1.0, -(c1 + c2v).re, (c1 * c2v).re)
        case None      => (1.0, -c1.re, 0.0)
      }
      val (b0, b1, b2) = coeffs(num1, num2)
      val (_, a1, a2) = coeffs(den1, den2)
      Sos(b0, b1, b2, a1, a2)
    }.toArray
    // fold gain into the first section's numerator
    if (sections.nonEmpty) {
      val s0 = sections(0)
      sections(0) = Sos(s0.b0 * gain, s0.b1 * gain, s0.b2 * gain, s0.a1, s0.a2)
    }
    sections
  }

  /** Single-pass SOS filtering (direct form II transposed), with optional
    * per-section initial conditions `zi` scaled by the caller.
    */
  def sosfilt(sos: Array[Sos], x: Array[Double], zi: Array[Array[Double]] = null): Array[Double] = {
    val y = java.util.Arrays.copyOf(x, x.length)
    var s = 0
    while (s < sos.length) {
      val sec = sos(s)
      var z0 = if (zi != null) zi(s)(0) else 0.0
      var z1 = if (zi != null) zi(s)(1) else 0.0
      var i = 0
      while (i < y.length) {
        val xn = y(i)
        val yn = sec.b0 * xn + z0
        z0 = sec.b1 * xn - sec.a1 * yn + z1
        z1 = sec.b2 * xn - sec.a2 * yn
        y(i) = yn
        i += 1
      }
      s += 1
    }
    y
  }

  /** Steady-state initial conditions per section for a unit step input,
    * cumulatively scaled by the DC gain of preceding sections
    * (scipy.signal.sosfilt_zi semantics).
    */
  def sosfiltZi(sos: Array[Sos]): Array[Array[Double]] = {
    var scale = 1.0
    sos.map { s =>
      val h = (s.b0 + s.b1 + s.b2) / (1.0 + s.a1 + s.a2) // DC gain
      val zi0 = scale * (h - s.b0)
      val zi1 = scale * (s.b2 - s.a2 * h)
      scale *= h
      Array(zi0, zi1)
    }
  }

  /** Zero-phase forward-backward SOS filtering with odd extension padding
    * (scipy.signal.sosfiltfilt semantics, default padlen = 3*(2*nsec+1)).
    */
  def sosfiltfilt(sos: Array[Sos], x: Array[Double]): Array[Double] = {
    val n = x.length
    val padlen = math.min(3 * (2 * sos.length + 1), n - 1)
    // odd extension
    val ext = new Array[Double](n + 2 * padlen)
    var i = 0
    while (i < padlen) { ext(i) = 2 * x(0) - x(padlen - i); i += 1 }
    System.arraycopy(x, 0, ext, padlen, n)
    i = 0
    while (i < padlen) { ext(padlen + n + i) = 2 * x(n - 1) - x(n - 2 - i); i += 1 }
    val ziBase = sosfiltZi(sos)
    def scaledZi(x0: Double): Array[Array[Double]] = ziBase.map(z => Array(z(0) * x0, z(1) * x0))
    // forward
    val fwd = sosfilt(sos, ext, scaledZi(ext(0)))
    // backward
    reverseInPlace(fwd)
    val bwd = sosfilt(sos, fwd, scaledZi(fwd(0)))
    reverseInPlace(bwd)
    java.util.Arrays.copyOfRange(bwd, padlen, padlen + n)
  }

  private def reverseInPlace(a: Array[Double]): Unit = {
    var i = 0
    var j = a.length - 1
    while (i < j) { val t = a(i); a(i) = a(j); a(j) = t; i += 1; j -= 1 }
  }

  /** Highpass filtfilt convenience matching the reference's postprocess
    * chain (/root/reference/xcorr/core/postprocess.py:133-141:
    * filter(frequency=3., btype='highpass', order=2) at the trace rate).
    */
  def highpassFiltFilt(x: Array[Double], freq: Double, fs: Double, order: Int = 2): Array[Double] =
    sosfiltfilt(butter(order, Array(freq / (fs / 2)), "highpass"), x)
}
