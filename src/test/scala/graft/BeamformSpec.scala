package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Beamform

class BeamformSpec extends AnyFunSuite {

  test("plane wave from the north recovered: slowness along +y, DOA ~ 0 deg") {
    // 5 receivers; a wave travelling in -y (arriving FROM +y / north) with
    // slowness s=0.25 s/m delays each receiver by s * y
    val coords = Array((0.0, 0.0), (8.0, 0.0), (0.0, 8.0), (8.0, 8.0), (4.0, 4.0))
    val delta = 0.05
    val s = 0.25
    val n = 512
    def sig(phase: Double): Array[Double] =
      Array.tabulate(n)(i => {
        val t = i * delta - phase
        math.exp(-0.5 * math.pow((t - 10) / 0.4, 2)) * math.cos(12 * t)
      })
    // delay tau_i = s * y_i (a wave front moving toward -y => later arrival
    // at smaller y); the pairwise delay model is tau_ij = s . (r_j - r_i)
    val series = coords.map { case (_, y) => sig(s * y) }
    val r = Beamform.planeWave(coords, series, delta)
    assert(math.abs(r.sy - s) < 0.02, s"sy=${r.sy}")
    assert(math.abs(r.sx) < 0.02, s"sx=${r.sx}")
    assert(math.abs(r.doaDeg - 0.0) < 6 || math.abs(r.doaDeg - 360) < 6, s"doa=${r.doaDeg}")
    assert(math.abs(r.velocity - 1 / s) < 0.4)
    assert(r.residual < 0.05)
  }

  test("diagonal arrival: DOA ~ 45 deg") {
    val coords = Array((0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0))
    val delta = 0.05
    val sx = 0.12; val sy = 0.12
    val n = 512
    def sig(phase: Double): Array[Double] =
      Array.tabulate(n)(i => {
        val t = i * delta - phase
        math.exp(-0.5 * math.pow((t - 10) / 0.5, 2))
      })
    val series = coords.map { case (x, y) => sig(sx * x + sy * y) }
    val r = Beamform.planeWave(coords, series, delta)
    assert(math.abs(r.doaDeg - 45.0) < 6, s"doa=${r.doaDeg}")
  }
}
