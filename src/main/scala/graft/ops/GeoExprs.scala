package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native geospatial expressions (reference §2.6). Same rationale as
  * `graft.functions.LshBucketExpr`: per-edge/per-cell loops belong in a
  * compact `doGenCode` loop, not an O(vertices) Column-algebra tree —
  * map-side, codegen'd, zero shuffle, polygon data rides along as an
  * array column (broadcast-joined reference data) or a literal.
  */

/** Ray-casting point-in-polygon. `ring` is a closed-or-open ring as
  * interleaved [lat0, lon0, lat1, lon1, ...] (the layout
  * `graft.sources.geo.ShapefileReader` and `PolygonTable` produce).
  * Crossing test per edge, XOR-folded — identical math to
  * [[Geo.pointInPolygon]]'s literal form. Null if any input is null.
  */
case class PointInPolygonExpr(lat: Expression, lon: Expression, ring: Expression)
    extends TernaryExpression {

  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = ring

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (lat.dataType, lon.dataType, ring.dataType) match {
      case (DoubleType, DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"point_in_polygon requires (double, double, array<double>), got $other")
    }

  override protected def nullSafeEval(latV: Any, lonV: Any, ringV: Any): Any = {
    val y = latV.asInstanceOf[Double]
    val x = lonV.asInstanceOf[Double]
    val r = ringV.asInstanceOf[ArrayData]
    val n = r.numElements() / 2
    var inside = false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val yi = r.getDouble(2 * i); val xi = r.getDouble(2 * i + 1)
      val yj = r.getDouble(2 * j); val xj = r.getDouble(2 * j + 1)
      if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside = !inside
      i += 1
    }
    inside
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (latV, lonV, ringV) => {
      val n = ctx.freshName("pipN")
      val i = ctx.freshName("pipI")
      val j = ctx.freshName("pipJ")
      val yi = ctx.freshName("pipYi")
      val xi = ctx.freshName("pipXi")
      val yj = ctx.freshName("pipYj")
      val xj = ctx.freshName("pipXj")
      val inside = ctx.freshName("pipInside")
      s"""
         |int $n = $ringV.numElements() / 2;
         |boolean $inside = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $j = ($i + 1) % $n;
         |  double $yi = $ringV.getDouble(2 * $i); double $xi = $ringV.getDouble(2 * $i + 1);
         |  double $yj = $ringV.getDouble(2 * $j); double $xj = $ringV.getDouble(2 * $j + 1);
         |  if ((($yi > $latV) != ($yj > $latV)) &&
         |      $lonV < ($xj - $xi) * ($latV - $yi) / ($yj - $yi) + $xi) {
         |    $inside = !$inside;
         |  }
         |}
         |${ev.value} = $inside;
         |""".stripMargin
    })

  override def prettyName: String = "point_in_polygon"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PointInPolygonExpr =
    copy(lat = newFirst, lon = newSecond, ring = newThird)
}

/** A regular lat/lon grid of float values (e.g. bathymetry) broadcast to
  * executors by plan reference — the in-memory form a NetCDF elevation
  * variable takes after loading (reference `src/main.py:561-571` does the
  * same via xarray: load once, bilinear per point). Row-major
  * [iLat][iLon]. `bilinear` returns NaN outside the grid (mapped to SQL
  * null by [[GridElevationExpr]] — the reference's flag_on_nan path).
  */
final class Grid(val lat0: Double, val dLat: Double, val nLat: Int,
                 val lon0: Double, val dLon: Double, val nLon: Int,
                 val values: Array[Float]) extends Serializable {
  require(values.length == nLat * nLon, "grid size mismatch")

  def valueAt(i: Int, j: Int): Double = values(i * nLon + j).toDouble

  def bilinear(lat: Double, lon: Double): Double = {
    val fy = (lat - lat0) / dLat
    val fx = (lon - lon0) / dLon
    val i = math.floor(fy).toInt
    val j = math.floor(fx).toInt
    if (i < 0 || j < 0 || i + 1 >= nLat || j + 1 >= nLon) Double.NaN
    else {
      val wy = fy - i
      val wx = fx - j
      valueAt(i, j) * (1.0 - wy) * (1.0 - wx) + valueAt(i, j + 1) * (1.0 - wy) * wx +
        valueAt(i + 1, j) * wy * (1.0 - wx) + valueAt(i + 1, j + 1) * wy * wx
    }
  }
}

/** Bilinear grid lookup as a native expression; the grid object is a plan
  * reference (shipped once per stage with the serialized plan, like a
  * broadcast literal — reference data is small by design).
  */
case class GridElevationExpr(lat: Expression, lon: Expression, grid: Grid)
    extends Expression {

  override def children: Seq[Expression] = Seq(lat, lon)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (lat.dataType == DoubleType && lon.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"grid_elevation requires (double, double), got (${lat.dataType}, ${lon.dataType})")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val latV = lat.eval(input)
    val lonV = lon.eval(input)
    if (latV == null || lonV == null) null
    else {
      val v = grid.bilinear(latV.asInstanceOf[Double], lonV.asInstanceOf[Double])
      if (v.isNaN) null else v
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gridRef = ctx.addReferenceObj("graftGrid", grid, classOf[Grid].getName)
    val latCode = lat.genCode(ctx)
    val lonCode = lon.genCode(ctx)
    val v = ctx.freshName("gridV")
    ev.copy(code =
      code"""
         |${latCode.code}
         |${lonCode.code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${latCode.isNull} && !${lonCode.isNull}) {
         |  double $v = $gridRef.bilinear(${latCode.value}, ${lonCode.value});
         |  if (!Double.isNaN($v)) { ${ev.isNull} = false; ${ev.value} = $v; }
         |}
         |""".stripMargin)
  }

  override def prettyName: String = "grid_elevation"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GridElevationExpr =
    copy(lat = newChildren(0), lon = newChildren(1))
}

/** WGS-84 geodesic distance (Vincenty inverse) — iterative, so it cannot
  * be a Column-algebra tree; the compiled loop lives in
  * [[Geo.vincentyM]] and both eval and codegen call it. Null if any
  * input is null. Ellipsoidal counterpart of [[Geo.haversineM]]
  * (reference geodesic model: geopy, tests/test_qc.py:38-40).
  */
case class GeodesicDistExpr(lat1: Expression, lon1: Expression,
                            lat2: Expression, lon2: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(lat1, lon1, lat2, lon2)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geodesic_dist requires four doubles, got ${children.map(_.dataType.sql).mkString(", ")}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = lat1.eval(input); val b = lon1.eval(input)
    val c = lat2.eval(input); val d = lon2.eval(input)
    if (a == null || b == null || c == null || d == null) null
    else Geo.vincentyM(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    ev.copy(code =
      code"""
         |${cs(0).code}
         |${cs(1).code}
         |${cs(2).code}
         |${cs(3).code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${cs(0).isNull} && !${cs(1).isNull} && !${cs(2).isNull} && !${cs(3).isNull}) {
         |  ${ev.isNull} = false;
         |  ${ev.value} = graft.ops.Geo.vincentyM(
         |    ${cs(0).value}, ${cs(1).value}, ${cs(2).value}, ${cs(3).value});
         |}
         |""".stripMargin)
  }

  override def prettyName: String = "geodesic_dist"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeodesicDistExpr =
    copy(lat1 = newChildren(0), lon1 = newChildren(1),
      lat2 = newChildren(2), lon2 = newChildren(3))
}

/** Native form of [[Geo.portableDistM]] — the bit-portable Horner
  * haversine. Same arithmetic (op-for-op) as the Column-tree rendering
  * `Geo.portableDistMColumns` and the DuckDB SQL `Geo.portableDistSql`,
  * via the scalar transcription `Geo.portableDistScalar`; pinned
  * bit-identical by `PortableDistSpec`.
  *
  * Why native: the kinematics projections instantiate the distance
  * several times (velocity = two distances; acceleration re-derives
  * velocity), and the ~60-node tree × per-node null plumbing crossed
  * the JVM's 64 KB generated-method limit — Spark then dropped the
  * whole scan stage to INTERPRETED execution. One static call keeps
  * the stage inside whole-stage codegen.
  */
case class PortableDistExpr(lat1: Expression, lon1: Expression,
                            lat2: Expression, lon2: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(lat1, lon1, lat2, lon2)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_dist requires four doubles, got ${children.map(_.dataType.sql).mkString(", ")}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = lat1.eval(input); val b = lon1.eval(input)
    val c = lat2.eval(input); val d = lon2.eval(input)
    if (a == null || b == null || c == null || d == null) null
    else Geo.portableDistScalar(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    ev.copy(code =
      code"""
         |${cs(0).code}
         |${cs(1).code}
         |${cs(2).code}
         |${cs(3).code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${cs(0).isNull} && !${cs(1).isNull} && !${cs(2).isNull} && !${cs(3).isNull}) {
         |  ${ev.isNull} = false;
         |  ${ev.value} = graft.ops.Geo.portableDistScalar(
         |    ${cs(0).value}, ${cs(1).value}, ${cs(2).value}, ${cs(3).value});
         |}
         |""".stripMargin)
  }

  override def prettyName: String = "portable_dist"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PortableDistExpr =
    copy(lat1 = newChildren(0), lon1 = newChildren(1),
      lat2 = newChildren(2), lon2 = newChildren(3))
}
