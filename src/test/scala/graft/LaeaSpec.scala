package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.icenet.Laea

/** Property tests for the polar LAEA (EPSG:6931/6932) <-> WGS84 math (F4).
  * The DuckDB oracle cannot check geodesy, so correctness rests on:
  * (a) pole maps to origin, (b) forward/inverse round-trip to ~1e-6 deg
  * (~0.1 m), (c) meridian/axis invariants, (d) radius sanity vs the
  * published EASE-Grid 2.0 extent.
  */
class LaeaSpec extends AnyFunSuite {

  private def roundTrip(north: Boolean, latLo: Double, latHi: Double): Unit = {
    val rnd = new scala.util.Random(42) // deterministic property sample
    (1 to 500).foreach { _ =>
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = latLo + rnd.nextDouble() * (latHi - latLo)
      val (x, y) = Laea.forward(lon, lat, north)
      val (lon2, lat2) = Laea.inverse(x, y, north)
      val dLon = math.abs(((lon2 - lon + 540) % 360) - 180)
      assert(dLon < 1e-6, s"lon drift at ($lon,$lat): $lon2")
      assert(math.abs(lat2 - lat) < 1e-6, s"lat drift at ($lon,$lat): $lat2")
    }
  }

  // Pole tolerance is 1 m, not 1e-6: Qp + q(-/+1) cancels to ~1e-16
  // relative, and A*sqrt(eps) amplifies that to ~0.1 m — pure float
  // residue, far below the 25 km grid pitch.
  test("north pole maps to projection origin and back") {
    val (x, y) = Laea.forward(0.0, 90.0, north = true)
    assert(math.abs(x) < 1.0 && math.abs(y) < 1.0)
    val (lon, lat) = Laea.inverse(0.0, 0.0, north = true)
    assert(lat == 90.0 && lon == 0.0)
  }

  test("south pole maps to projection origin and back") {
    val (x, y) = Laea.forward(0.0, -90.0, north = false)
    assert(math.abs(x) < 1.0 && math.abs(y) < 1.0)
    assert(Laea.inverse(0.0, 0.0, north = false)._2 == -90.0)
  }

  test("prime meridian lies on x=0 with y<0 in the north aspect") {
    val (x, y) = Laea.forward(0.0, 70.0, north = true)
    assert(math.abs(x) < 1e-6 && y < 0)
  }

  test("lon 90E at lat 70N lies on the +x axis") {
    val (x, y) = Laea.forward(90.0, 70.0, north = true)
    assert(x > 0 && math.abs(y) < 1e-6)
  }

  test("round-trip inverse(forward(lon,lat)) within 1e-6 deg — north")(
    roundTrip(north = true, 30.0, 89.9))

  test("round-trip within 1e-6 deg — south")(
    roundTrip(north = false, -89.9, -30.0))

  test("scale sanity: 70N ring radius ~ 2.2e6 m (inside EASE-Grid 2.0 extent)") {
    val (x, y) = Laea.forward(45.0, 70.0, north = true)
    val rho = math.hypot(x, y)
    assert(rho > 2.0e6 && rho < 2.4e6)
  }
}
