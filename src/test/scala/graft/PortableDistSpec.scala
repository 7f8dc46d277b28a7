package graft

import graft.ops.Geo
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** G6 portable distance: (1) accuracy vs true haversine inside the
  * regional envelope, (2) bitwise equality between the Column tree and
  * the SQL text rendering — the operation-order lockstep that makes the
  * DuckDB oracle reproduce it exactly (the cross-engine half of the
  * claim is exercised by tools/compare.py on w3_velocity).
  */
class PortableDistSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // dense grid of realistic ship-track steps around the Belgian bight
  private def pairs = for {
    lat <- BigDecimal(50.9) to BigDecimal(51.5) by BigDecimal(0.07)
    lon <- BigDecimal(2.6) to BigDecimal(3.2) by BigDecimal(0.07)
    (dLat, dLon) <- Seq((0.0001, 0.0), (0.0, 0.0001), (0.01, 0.01), (-0.05, 0.02))
  } yield (lat.toDouble, lon.toDouble, lat.toDouble + dLat, lon.toDouble + dLon)

  test("polynomial distance tracks true haversine to <1e-9 relative regionally") {
    val df = pairs.toDF("lat1", "lon1", "lat2", "lon2")
    val rows = df.select(
      Geo.portableDistM($"lat1", $"lon1", $"lat2", $"lon2").as("poly"),
      Geo.haversineM($"lat1", $"lon1", $"lat2", $"lon2").as("true")).collect()
    rows.foreach { r =>
      val (p, t) = (r.getDouble(0), r.getDouble(1))
      if (t > 1.0) // skip degenerate zero-distance pairs
        math.abs(p - t) / t should be < 1e-9
    }
  }

  test("Column tree and SQL text rendering are bit-identical") {
    val df = pairs.toDF("lat1", "lon1", "lat2", "lon2")
    val viaSql = Geo.portableDistSql("lat1", "lon1", "lat2", "lon2")
    val rows = df.select(
      Geo.portableDistM($"lat1", $"lon1", $"lat2", $"lon2").as("col_form"),
      expr(viaSql).as("sql_form")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("native PortableDistExpr is bit-identical to the Column-tree " +
    "rendering, and null-propagates per input") {
    val df = pairs.toDF("lat1", "lon1", "lat2", "lon2")
    val rows = df.select(
      Geo.portableDistM($"lat1", $"lon1", $"lat2", $"lon2").as("native"),
      Geo.portableDistMColumns($"lat1", $"lon1", $"lat2", $"lon2").as("tree"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native/tree bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
    // interpreted eval path (what WindowExec & non-codegen contexts use)
    // matches codegen: evaluate the same expression under a filter that
    // forces the interpreted projection via collect on a tiny frame
    val one = Seq((51.2, 2.9, 51.21, 2.91)).toDF("lat1", "lon1", "lat2", "lon2")
    val viaNative = one.select(
      Geo.portableDistM($"lat1", $"lon1", $"lat2", $"lon2")).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(viaNative) ==
      java.lang.Double.doubleToLongBits(
        Geo.portableDistScalar(51.2, 2.9, 51.21, 2.91)))
    // any null input → null out (the Column tree's propagation contract)
    val withNull = Seq((Some(51.2), Some(2.9), Option.empty[Double], Some(2.91)))
      .toDF("lat1", "lon1", "lat2", "lon2")
    assert(withNull.select(
      Geo.portableDistM($"lat1", $"lon1", $"lat2", $"lon2")).head().isNullAt(0))
  }

  test("double literals round-trip through SQL text exactly") {
    // dlit must force DOUBLE parsing (a bare decimal would parse DECIMAL)
    val x = 0.017453292519943295
    val parsed = spark.sql(s"SELECT ${Geo.dlit(x)} AS v").collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToLongBits(parsed) == java.lang.Double.doubleToLongBits(x))
  }
}
