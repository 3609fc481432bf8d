package graft.icenet

/** Polar Lambert Azimuthal Equal-Area projection on the WGS84 ellipsoid —
  * the inverse of what the reference delegates to PostGIS `ST_Transform`
  * (reference: azfunctions/InputBlobTrigger/processor.py:252, transforming
  * cell polygons from EPSG:6931/6932 to EPSG:4326).
  *
  * EPSG:6931 = NSIDC EASE-Grid 2.0 North (lat origin +90, lon origin 0).
  * EPSG:6932 = NSIDC EASE-Grid 2.0 South (lat origin -90, lon origin 0).
  *
  * Formulas follow Snyder, "Map Projections — A Working Manual" (USGS
  * Professional Paper 1395), pp. 187-190, polar ellipsoidal aspect. Pure
  * math, no external geodesy dependency (offline build).
  */
object Laea {
  private val A  = 6378137.0               // WGS84 semi-major axis (m)
  private val F  = 1.0 / 298.257223563     // flattening
  private val E2 = F * (2.0 - F)           // eccentricity squared
  private val E  = math.sqrt(E2)

  /** Snyder eq. 3-12: authalic q for a given sin(latitude). */
  private def q(sinPhi: Double): Double = {
    val esin = E * sinPhi
    (1.0 - E2) * (sinPhi / (1.0 - esin * esin) -
      (1.0 / (2.0 * E)) * math.log((1.0 - esin) / (1.0 + esin)))
  }

  private val Qp = q(1.0) // q at the pole

  // Authalic-to-geodetic latitude series coefficients (Snyder eq. 3-18).
  private val C2 = E2 / 3.0 + 31.0 * E2 * E2 / 180.0 + 517.0 * E2 * E2 * E2 / 5040.0
  private val C4 = 23.0 * E2 * E2 / 360.0 + 251.0 * E2 * E2 * E2 / 3780.0
  private val C6 = 761.0 * E2 * E2 * E2 / 45360.0

  /** Inverse polar LAEA: projected meters -> (lonDegrees, latDegrees).
    * @param north true for EPSG:6931, false for EPSG:6932
    */
  def inverse(x: Double, y: Double, north: Boolean): (Double, Double) = {
    val rho = math.hypot(x, y)
    if (rho < 1e-9) return (0.0, if (north) 90.0 else -90.0)
    // Snyder eq. 24-31 (polar): q = +/-(qp - rho^2/a^2)
    val qVal = {
      val v = Qp - (rho * rho) / (A * A)
      if (north) v else -v
    }
    val beta = math.asin(math.max(-1.0, math.min(1.0, qVal / Qp)))
    val phi = beta + C2 * math.sin(2 * beta) + C4 * math.sin(4 * beta) +
      C6 * math.sin(6 * beta)
    // Snyder eq. 20-16/20-17: north lambda = atan2(x, -y); south atan2(x, y)
    val lam = if (north) math.atan2(x, -y) else math.atan2(x, y)
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** Forward polar LAEA: (lonDegrees, latDegrees) -> projected meters.
    * Used only by property tests (round-trip validation). Snyder eq. 24-23/24.
    */
  def forward(lonDeg: Double, latDeg: Double, north: Boolean): (Double, Double) = {
    val lam = math.toRadians(lonDeg)
    val qVal = q(math.sin(math.toRadians(latDeg)))
    val rho =
      if (north) A * math.sqrt(math.max(0.0, Qp - qVal))
      else A * math.sqrt(math.max(0.0, Qp + qVal))
    if (north) (rho * math.sin(lam), -rho * math.cos(lam))
    else (rho * math.sin(lam), rho * math.cos(lam))
  }
}
