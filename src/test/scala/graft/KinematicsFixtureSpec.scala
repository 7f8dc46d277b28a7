package graft

import graft.ops.{Geo, WindowKernels}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** W3 physics-fixture parity (reference `tests/resources/data_velocity_acc.csv`
  * + `tests/test_qc.py:33-47,395-435`): a track reconstructed by
  * dead-reckoning from (lat 51.37115902107277, lon 3.1840709669760137);
  * the Velocity / Acceleration columns are the oracle. The reference uses
  * WGS-84 geodesic steps; we dead-reckon on the same sphere as our
  * haversine (SURVEY G6: ≤0.3% model difference, absorbed by rtol), which
  * pins the kernel's composition (distance → velocity → Δvelocity) and
  * the forward/backward attachment semantics exactly.
  */
class KinematicsFixtureSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // Time(s), Distance(m), Heading(deg), Velocity(m/s), Acceleration(m/s²)
  private val fixture = Seq(
    (0.0, 0.0, 0.0, 29.2344416715522, 5.63353245117988),
    (2.0, 58.4688833431044, 115.294802856326, 40.501506573912, -19.0058563803439),
    (4.0, 81.0030131478239, 32.2791900836716, 2.48979381322407, 14.6874850037343),
    (6.0, 4.97958762644813, 6.04750229940657, 31.8647638206928, 6.49975356412687),
    (8.0, 63.7295276413855, 99.8567159650443, 44.8642709489465, 0.68427629569295),
    (10.0, 89.728541897893, 50.3049177811936, 46.2328235403324, -18.1690214800256),
    (12.0, 92.4656470806648, 78.1786152225806, 9.89478058028115, 24.8770372373044),
    (14.0, 19.7895611605623, 355.643068020884, 59.64885505489, -0.48867638586675),
    (16.0, 119.29771010978, 187.16878737548, 58.6715022831565, 0.0),
    (18.0, 117.343004566313, 165.604463626564, 0.0, 0.0))

  /** Spherical dead-reckoning destination (same radius as Geo.haversineM). */
  private def destination(lat: Double, lon: Double, dM: Double, bearingDeg: Double): (Double, Double) = {
    val R = Geo.EarthRadiusM
    val d = dM / R
    val br = math.toRadians(bearingDeg)
    val p1 = math.toRadians(lat)
    val l1 = math.toRadians(lon)
    val p2 = math.asin(math.sin(p1) * math.cos(d) + math.cos(p1) * math.sin(d) * math.cos(br))
    val l2 = l1 + math.atan2(math.sin(br) * math.sin(d) * math.cos(p1),
      math.cos(d) - math.sin(p1) * math.sin(p2))
    (math.toDegrees(p2), math.toDegrees(l2))
  }

  private def track: Seq[(Long, Long, Double, Double)] = { // (id, t_us, lat, lon)
    var pos = (51.37115902107277, 3.1840709669760137)
    fixture.zipWithIndex.map { case ((t, dist, heading, _, _), i) =>
      if (i > 0) pos = destination(pos._1, pos._2, dist, heading)
      (i.toLong, (t * 1e6).toLong, pos._1, pos._2)
    }
  }

  private val w = Window.partitionBy(lit(1)).orderBy($"t_us")

  private def kinematics = WindowKernels.velocityAcceleration(
    track.toDF("id", "t_us", "lat", "lon"), w, $"lat", $"lon", $"t_us")
    .orderBy($"id")

  test("velocity matches the fixture oracle (backward == fixture's forward shifted 1)") {
    val v = kinematics.select($"velocity_ms").collect()
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    // our velocity at row i+1 == fixture velocity at row i
    fixture.dropRight(1).zipWithIndex.foreach { case ((_, _, _, vExp, _), i) =>
      v(i + 1) shouldBe vExp +- math.max(3e-3 * vExp, 1e-6) // spherical model tolerance
    }
    assert(v(0).isNaN) // no previous point
  }

  test("acceleration matches the fixture oracle (shifted 2)") {
    val a = kinematics.select($"acceleration_ms2").collect()
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    fixture.dropRight(2).zipWithIndex.foreach { case ((_, _, _, _, aExp), i) =>
      a(i + 2) shouldBe aExp +- math.max(3e-3 * math.abs(aExp) + 0.05, 0.05)
    }
  }

  test("WGS-84 geodesic kinematics: fixture velocities at rtol 1e-4 (geopy model)") {
    // dead-reckon the track on the WGS-84 ellipsoid (Vincenty direct —
    // the mirror of geopy's destination steps in test_qc.py:38-44), then
    // recover the kinematics with the ellipsoidal distance. With model
    // and data on the same ellipsoid, the tolerance drops from the
    // spherical 3e-3 to 1e-4 (the round-trip itself is sub-millimeter).
    var pos = (51.37115902107277, 3.1840709669760137)
    val wgsTrack = fixture.zipWithIndex.map { case ((t, dist, heading, _, _), i) =>
      if (i > 0) pos = Geo.geodesicDestination(pos._1, pos._2, dist, heading)
      (i.toLong, (t * 1e6).toLong, pos._1, pos._2)
    }
    val k = WindowKernels.velocityAcceleration(
      wgsTrack.toDF("id", "t_us", "lat", "lon"), w, $"lat", $"lon", $"t_us",
      distM = Geo.geodesicM).orderBy($"id")
    val v = k.select($"velocity_ms").collect()
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    val acc = k.select($"acceleration_ms2").collect()
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    fixture.dropRight(1).zipWithIndex.foreach { case ((_, _, _, vExp, _), i) =>
      v(i + 1) shouldBe vExp +- math.max(1e-4 * vExp, 1e-7)
    }
    fixture.dropRight(2).zipWithIndex.foreach { case ((_, _, _, _, aExp), i) =>
      acc(i + 2) shouldBe aExp +- math.max(1e-4 * math.abs(aExp), 1e-6)
    }
  }

  test("vincenty inverse round-trips the direct problem to sub-millimeter") {
    val cases = Seq((51.37, 3.18, 1234.5, 47.0), (51.37, 3.18, 89.3, 200.0),
      (-33.9, 151.2, 50000.0, 310.0), (0.01, 0.01, 5.0, 90.0))
    cases.foreach { case (lat, lon, d, brg) =>
      val (lat2, lon2) = Geo.geodesicDestination(lat, lon, d, brg)
      val back = Geo.vincentyM(lat, lon, lat2, lon2)
      assert(math.abs(back - d) < 1e-3, s"($lat,$lon,$d,$brg): got $back")
    }
    // degenerate + sanity: zero distance, meridian arc near-spherical
    assert(Geo.vincentyM(51.0, 3.0, 51.0, 3.0) == 0.0)
    val oneDegLat = Geo.vincentyM(50.5, 3.0, 51.5, 3.0)
    assert(oneDegLat > 110500 && oneDegLat < 111500, s"meridian deg: $oneDegLat")
  }

  test("max-velocity check: 90 m/s => none, 0 => all segments (test_qc.py:395-403)") {
    val k = kinematics
    val flagged = k
      .withColumn("ex90", WindowKernels.exceedsOnEitherEndpoint($"velocity_ms", 90.0, w))
      .withColumn("ex0", WindowKernels.exceedsOnEitherEndpoint($"velocity_ms", 0.0, w))
    assert(flagged.filter($"ex90").count() == 0)
    assert(flagged.filter($"ex0").count() == 10) // every row touches an exceeding segment
  }

  test("degenerate 1 ns dt => huge velocity => both endpoints flag (test_qc.py:405-412)") {
    // row 4's time = row 3's time + 1 ns (µs-truncated: same µs => dt 0 => null;
    // use +1 µs, the smallest representable step, to mirror the intent)
    val t = track.map { case (id, tUs, lat, lon) =>
      (id, if (id == 4L) track(3)._2 + 1L else tUs, lat, lon)
    }
    val k = WindowKernels.velocityAcceleration(
      t.toDF("id", "t_us", "lat", "lon"), w, $"lat", $"lon", $"t_us")
    val flagged = k
      .withColumn("ex", WindowKernels.exceedsOnEitherEndpoint($"velocity_ms", 90.0, w))
      .filter($"ex").select($"id").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(3L, 4L)) // both endpoints of the degenerate segment
  }
}
