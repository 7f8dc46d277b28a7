package graft

import graft.ops.Geo
import graft.sources.geo.{GridLoader, PolygonTable, ShapefileReader}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** S8/S9 loaders: ESRI shapefile + dbf binary parse, WKT polygon-table
  * (the JDBC/PostGIS SeaVox shape), f32 grid load, and the native
  * PIP/bilinear expressions over loaded data — closing the round-1 gap
  * "engine pieces real, only synthetic instantiations".
  */
class GeoLoadersSpec extends SparkSpec {

  // ---- in-test binary fixtures ------------------------------------------

  /** One-polygon .shp (type 5) with the given ring ((lon,lat) pairs). */
  private def writeShp(rings: Seq[Array[(Double, Double)]]): String = {
    val recs = rings.map { pts =>
      val contentBytes = 4 + 32 + 4 + 4 + 4 + 16 * pts.length
      val b = ByteBuffer.allocate(8 + contentBytes)
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(1).putInt(contentBytes / 2)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(5) // Polygon
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      b.putDouble(xs.min).putDouble(ys.min).putDouble(xs.max).putDouble(ys.max)
      b.putInt(1).putInt(pts.length).putInt(0)
      pts.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
      b.array()
    }
    val total = 100 + recs.map(_.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(9994); buf.position(24); buf.putInt(total / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1000).putInt(5)
    buf.position(100)
    recs.foreach(buf.put)
    val f = Files.createTempFile("graft_test", ".shp")
    Files.write(f, buf.array())
    f.toString
  }

  /** Companion .dbf with a single 10-char NAME column. */
  private def writeDbf(names: Seq[String]): String = {
    val headerSize = 32 + 32 + 1
    val recordSize = 1 + 10
    val buf = ByteBuffer.allocate(headerSize + names.length * recordSize + 1)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte); buf.position(4); buf.putInt(names.length)
    buf.putShort(8, headerSize.toShort); buf.putShort(10, recordSize.toShort)
    buf.position(32)
    val nameBytes = "NAME".getBytes("US-ASCII") ++ Array.fill(7)(0.toByte)
    buf.put(nameBytes); buf.put('C'.toByte)
    buf.position(32 + 16); buf.put(10.toByte)
    buf.position(32 + 32); buf.put(0x0d.toByte)
    names.foreach { n =>
      buf.put(' '.toByte)
      buf.put(n.padTo(10, ' ').take(10).getBytes("US-ASCII"))
    }
    buf.put(0x1a.toByte)
    val f = Files.createTempFile("graft_test", ".dbf")
    Files.write(f, buf.array())
    f.toString
  }

  // a square and a triangle in the Belgian bight
  private val square = Array((2.0, 51.0), (3.0, 51.0), (3.0, 52.0), (2.0, 52.0), (2.0, 51.0))
  private val triangle = Array((3.5, 51.0), (4.5, 51.0), (4.0, 52.0), (3.5, 51.0))

  test("shapefile + dbf: binary parse round-trips rings and names") {
    val shp = writeShp(Seq(square, triangle))
    val dbf = writeDbf(Seq("SQUARE", "TRIANGLE"))
    val shapes = ShapefileReader.readShp(shp)
    val names = ShapefileReader.readDbfStrings(dbf, "NAME")
    assert(shapes.length == 2 && names == Seq("SQUARE", "TRIANGLE"))
    // interleaved lat,lon: first vertex of the square is (lat 51, lon 2)
    assert(shapes.head.outerRing.take(2).toSeq == Seq(51.0, 2.0))
    assert(shapes.head.outerRing.length == 2 * square.length)
  }

  test("polygon table from shapefile classifies points (broadcast join path)") {
    val shp = writeShp(Seq(square, triangle))
    val dbf = writeDbf(Seq("SQUARE", "TRIANGLE"))
    val polys = PolygonTable.fromShapefile(spark, shp, dbf, "NAME")
    assert(polys.count() == 2)
    import spark.implicits._
    val pts = Seq((1L, 51.5, 2.5), (2L, 51.2, 4.0), (3L, 55.0, 9.9))
      .toDF("id", "lat", "lon")
    val got = Geo.classifyByPolygonTable(pts, polys, "id", col("lat"), col("lon"))
      .select("id", "region").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "SQUARE" && got(2L) == "TRIANGLE" && got(3L) == null)
  }

  test("WKT polygon table (the ST_AsText/JDBC shape) matches the literal PIP") {
    import spark.implicits._
    val wkt = Seq(("BIGHT", "SOUTH", "POLYGON ((2 51, 3 51, 3 52, 2 52, 2 51))"))
      .toDF("name", "sub", "wkt")
    val polys = PolygonTable.fromWkt(wkt, "name", "sub", "wkt")
    val ring = PolygonTable.parseWktPolygonRing("POLYGON ((2 51, 3 51, 3 52, 2 52, 2 51))")
    assert(ring.take(4).toSeq == Seq(51.0, 2.0, 51.0, 3.0))
    val pts = Seq((1L, 51.5, 2.5), (2L, 50.0, 2.5)).toDF("id", "lat", "lon")
    val byTable = Geo.classifyByPolygonTable(pts, polys, "id", col("lat"), col("lon"))
      .select("id", "region").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byTable(1L) == "BIGHT" && byTable(2L) == null)
    // native ring-column PIP == literal Column-algebra PIP on a point grid
    val grid = for { la <- 50 to 53; lo <- 1 to 4 } yield (la + 0.5, lo + 0.5)
    val gridDf = grid.toDF("lat", "lon")
    val both = gridDf.select(
      Geo.pointInPolygonCol(col("lat"), col("lon"), typedLit(ring.toSeq)).as("native"),
      Geo.pointInPolygon(col("lat"), col("lon"),
        Seq((51.0, 2.0), (51.0, 3.0), (52.0, 3.0), (52.0, 2.0))).as("literal"))
      .collect()
    both.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("fromJdbc over a live embedded-Derby loopback == fromWkt on the same rows") {
    // the S9 transport leg: a real JDBC read (in-process Derby stands in
    // for PostGIS, exactly as the loopback HTTP server stands in for the
    // STA endpoint in StaHttpSpec) feeding the same WKT parse
    val url = "jdbc:derby:memory:seavox_test;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE seavox (name VARCHAR(64), sub_region VARCHAR(64), wkt VARCHAR(512))")
      st.execute("INSERT INTO seavox VALUES " +
        "('BIGHT', 'SOUTH', 'POLYGON ((2 51, 3 51, 3 52, 2 52, 2 51))'), " +
        "('DELTA', 'NORTH', 'POLYGON ((3.5 51, 4.5 51, 4 52, 3.5 51))')")
      st.close()
    } finally conn.close()

    val polys = PolygonTable.fromJdbc(spark, url,
      "SELECT name, sub_region, wkt FROM seavox", "name", "sub_region", "wkt")

    import spark.implicits._
    val sameRows = Seq(
      ("BIGHT", "SOUTH", "POLYGON ((2 51, 3 51, 3 52, 2 52, 2 51))"),
      ("DELTA", "NORTH", "POLYGON ((3.5 51, 4.5 51, 4 52, 3.5 51))"))
      .toDF("name", "sub_region", "wkt")
    val direct = PolygonTable.fromWkt(sameRows, "name", "sub_region", "wkt")
    assert(polys.collect().toSeq.sortBy(_.getInt(0)) ==
      direct.collect().toSeq.sortBy(_.getInt(0)))

    // end-to-end: the JDBC-loaded table classifies points like any other
    val pts = Seq((1L, 51.5, 2.5), (2L, 51.2, 4.0), (3L, 55.0, 9.9))
      .toDF("id", "lat", "lon")
    val got = Geo.classifyByPolygonTable(pts, polys, "id", col("lat"), col("lon"))
      .select("id", "region").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "BIGHT" && got(2L) == "DELTA" && got(3L) == null)
  }

  test("csv grid loader: sparse cells load, missing cells are NaN => null lookups") {
    val dir = Files.createTempDirectory("graft_grid_csv")
    val f = dir.resolve("grid.csv")
    Files.write(f, ("i,j,value\n0,0,-10.5\n0,1,-9.5\n1,0,-8.5\n1,1,-7.5\n").getBytes)
    val grid = GridLoader.fromCsv(spark, f.toString, 50.0, 0.1, 3, 2.0, 0.1, 3)
    // center of the loaded 2x2 block: plain bilinear average
    assert(math.abs(grid.bilinear(50.05, 2.05) - (-10.5 - 9.5 - 8.5 - 7.5) / 4.0) < 1e-9)
    // any cell of the interpolation square missing => NaN => null elevation
    assert(grid.bilinear(50.15, 2.15).isNaN)
    import spark.implicits._
    val out = Seq((50.15, 2.15)).toDF("lat", "lon")
      .select(Geo.gridElevationFrom(grid, col("lat"), col("lon"))).collect()
    assert(out(0).isNullAt(0))
  }

  test("netcdf classic grid loader: CDF-1 short + scale/offset/fill decodes like xarray") {
    // fixture written by tools/make_netcdf_fixture.py — an independent
    // encoder of the public classic-format spec (4x5 grid, raw cell
    // 10i+j, scale 0.5, offset -100, one fill hole at (2,3))
    val path = getClass.getResource("/bathy_fixture.nc").getPath
    val grid = GridLoader.fromNetcdf(path, "elevation")
    assert(grid.lat0 == 50.0 && grid.dLat == 0.5 && grid.nLat == 4)
    assert(grid.lon0 == 3.0 && grid.dLon == 0.25 && grid.nLon == 5)
    assert(grid.valueAt(0, 0) == -100.0) // 0*0.5 - 100
    assert(grid.valueAt(1, 2) == -94.0)  // 12*0.5 - 100
    assert(grid.valueAt(2, 3).isNaN)     // _FillValue => NaN => null lookups
    // bilinear midpoint between 4 decoded cells
    val mid = grid.bilinear(50.25, 3.125)
    val expect = (-100.0 + -99.5 + -95.0 + -94.5) / 4
    assert(math.abs(mid - expect) < 1e-9, s"$mid vs $expect")
  }

  test("netcdf CDF-2 float variant loads the same decoded values") {
    val p1 = getClass.getResource("/bathy_fixture.nc").getPath
    val p2 = getClass.getResource("/bathy_fixture2.nc").getPath
    val g1 = GridLoader.fromNetcdf(p1, "elevation")
    val g2 = GridLoader.fromNetcdf(p2, "elevation")
    assert(g1.nLat == g2.nLat && g1.nLon == g2.nLon)
    for (i <- 0 until g1.nLat; j <- 0 until g1.nLon) {
      val (a, b) = (g1.valueAt(i, j), g2.valueAt(i, j))
      assert((a.isNaN && b.isNaN) || a == b, s"($i,$j): $a vs $b")
    }
  }

  test("netcdf loader fails loudly on wrong variable and non-classic files") {
    val path = getClass.getResource("/bathy_fixture.nc").getPath
    val e = intercept[IllegalArgumentException](GridLoader.fromNetcdf(path, "nope"))
    assert(e.getMessage.contains("no variable"))
    val junk = Files.createTempFile("graft_junk", ".nc")
    Files.write(junk, "JUNKJUNK".getBytes)
    intercept[IllegalArgumentException](GridLoader.fromNetcdf(junk.toString, "elevation"))
    // an HDF5 container routes to the netCDF-4 reader; a truncated one
    // must fail with a clear message, not a raw buffer underflow
    val h5 = Files.createTempFile("graft_h5", ".nc")
    Files.write(h5, Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    val eh = intercept[IllegalArgumentException](
      GridLoader.fromNetcdf(h5.toString, "elevation"))
    assert(eh.getMessage.contains("truncated or corrupt"))
  }

  test("netCDF-4 (HDF5) grid: loads via the same entry point, values match the classic file") {
    // classic fixture decoded (scale/offset/fill applied) → re-encoded as
    // an HDF5 container by the spec-derived test writer (MiniHdf5, written
    // independently of Hdf5Reader) → loaded back through fromNetcdf's
    // magic dispatch; every cell must match, NaN holes included
    val classic = GridLoader.fromNetcdf(
      getClass.getResource("/bathy_fixture.nc").getPath, "elevation")
    val lat = (0 until classic.nLat).map(i => classic.lat0 + i * classic.dLat).toArray
    val lon = (0 until classic.nLon).map(j => classic.lon0 + j * classic.dLon).toArray
    val h5Path = Files.createTempFile("graft_nc4_fixture", ".nc").toString
    MiniHdf5.writeGrid(h5Path, "elevation", lat, lon, classic.values)

    val nc4 = GridLoader.fromNetcdf(h5Path, "elevation")
    assert(nc4.lat0 == classic.lat0 && nc4.dLat == classic.dLat && nc4.nLat == classic.nLat)
    assert(nc4.lon0 == classic.lon0 && nc4.dLon == classic.dLon && nc4.nLon == classic.nLon)
    for (i <- 0 until classic.nLat; j <- 0 until classic.nLon) {
      val (a, b) = (classic.valueAt(i, j), nc4.valueAt(i, j))
      assert((a.isNaN && b.isNaN) || a == b, s"($i,$j): classic=$a nc4=$b")
    }
    // unsupported-feature errors name the escape hatch
    val h5 = graft.sources.geo.Hdf5Reader.open(h5Path)
    assert(h5.datasets.keySet == Set("elevation", "lat", "lon"))
  }

  test("netCDF-4 chunked + shuffle + deflate grid applies scale/offset/fill attributes") {
    // 4×5 grid in 3×2 chunks (edge chunks full-size with padding, as
    // HDF5 writes them), PACKED values + decoding attributes — the
    // profile a real GEBCO/EMODnet download uses. Written by the
    // spec-derived independent encoder; the reader must walk the chunk
    // B-tree, inflate (zlib), un-shuffle, scatter, and decode
    // scale_factor/add_offset/_FillValue exactly like the classic path.
    val lat = Array(10.0, 10.5, 11.0, 11.5)
    val lon = Array(20.0, 20.25, 20.5, 20.75, 21.0)
    val scale = 0.5; val offset = 10.0; val fill = -999.0f
    val expect = Array(
      12.0, 13.5, -5.0, 0.0, 7.5,
      Double.NaN, 42.5, 8.0, -12.5, 3.0,
      1.5, Double.NaN, 99.0, -0.5, 2.0,
      -3.5, 4.0, 5.5, 6.0, Double.NaN)
    // (v - offset)/scale is integral for every value above → the packed
    // f32 round-trips to the exact expected double
    val packed = expect.map(v => if (v.isNaN) fill else ((v - offset) / scale).toFloat)
    for ((defl, shuf) <- Seq((true, true), (true, false), (false, false))) {
      val p = Files.createTempFile(s"graft_nc4_chunked_${defl}_$shuf", ".nc").toString
      MiniHdf5.writeGridChunked(p, "elevation", lat, lon, packed,
        chunkRows = 3, chunkCols = 2, deflate = defl, shuffle = shuf,
        atts = Seq("scale_factor" -> scale, "add_offset" -> offset,
          "_FillValue" -> fill.toDouble))
      val g = GridLoader.fromNetcdf(p, "elevation")
      assert(g.nLat == 4 && g.nLon == 5)
      for (i <- 0 until 4; j <- 0 until 5) {
        val (a, b) = (expect(i * 5 + j), g.valueAt(i, j))
        assert((a.isNaN && b.isNaN) || a == b,
          s"($i,$j) deflate=$defl shuffle=$shuf: want $a got $b")
      }
    }
  }

  test("latest-format HDF5 (superblock v3, OHDR, layout v4) reads equal to classic encodings") {
    // same grid/attributes as the chunked case, re-encoded in the
    // latest file format: superblock v3, v2 object headers with compact
    // root Link messages, v2 filter pipeline, v3 attributes, layout v4
    // with a Fixed Array chunk index (multi-chunk) or a Single Chunk
    // index (chunk covers grid) — the profiles H5F_LIBVER_LATEST /
    // recent h5py defaults emit. Every decoded cell must equal the
    // classic chunked encoding's.
    val lat = Array(10.0, 10.5, 11.0, 11.5)
    val lon = Array(20.0, 20.25, 20.5, 20.75, 21.0)
    val scale = 0.5; val offset = 10.0; val fill = -999.0f
    val expect = Array(
      12.0, 13.5, -5.0, 0.0, 7.5,
      Double.NaN, 42.5, 8.0, -12.5, 3.0,
      1.5, Double.NaN, 99.0, -0.5, 2.0,
      -3.5, 4.0, 5.5, 6.0, Double.NaN)
    val packed = expect.map(v => if (v.isNaN) fill else ((v - offset) / scale).toFloat)
    val attList = Seq("scale_factor" -> scale, "add_offset" -> offset,
      "_FillValue" -> fill.toDouble)
    // (chunkRows, chunkCols, deflate, shuffle): fixed-array filtered,
    // fixed-array unfiltered, single-chunk filtered, single-chunk raw
    for ((cr, cc, defl, shuf) <- Seq((3, 2, true, true), (3, 2, false, false),
      (4, 5, true, true), (4, 5, false, false))) {
      val p = Files.createTempFile(s"graft_v2_${cr}_${cc}_${defl}_$shuf", ".nc").toString
      MiniHdf5.writeGridV2(p, "elevation", lat, lon, packed,
        chunkRows = cr, chunkCols = cc, deflate = defl, shuffle = shuf,
        atts = attList)
      val g = GridLoader.fromNetcdf(p, "elevation")
      assert(g.nLat == 4 && g.nLon == 5)
      for (i <- 0 until 4; j <- 0 until 5) {
        val (a, b) = (expect(i * 5 + j), g.valueAt(i, j))
        assert((a.isNaN && b.isNaN) || a == b,
          s"($i,$j) chunks=${cr}x$cc deflate=$defl shuffle=$shuf: want $a got $b")
      }
      // the latest-format fixture exercises the v2-header dataset walk:
      // all three variables must be discovered via root Link messages
      val h5 = graft.sources.geo.Hdf5Reader.open(p)
      assert(h5.datasets.keySet == Set("elevation", "lat", "lon"))

      // same file with DENSE root-group links (Link Info → fractal heap
      // + v2 B-tree name index, the layout past the 8-link compact
      // threshold): every decoded cell must equal the compact variant's
      val pd = Files.createTempFile(s"graft_v2d_${cr}_${cc}", ".nc").toString
      MiniHdf5.writeGridV2(pd, "elevation", lat, lon, packed,
        chunkRows = cr, chunkCols = cc, deflate = defl, shuffle = shuf,
        atts = attList, denseRoot = true)
      val gd = GridLoader.fromNetcdf(pd, "elevation")
      for (i <- 0 until 4; j <- 0 until 5) {
        val (a, b) = (expect(i * 5 + j), gd.valueAt(i, j))
        assert((a.isNaN && b.isNaN) || a == b,
          s"dense ($i,$j) chunks=${cr}x$cc: want $a got $b")
      }
      assert(graft.sources.geo.Hdf5Reader.open(pd).datasets.keySet ==
        Set("elevation", "lat", "lon"))
    }
  }

  test("dense links: multi-level v2 B-tree name index + doubled heap rows") {
    // 10 extra hard links (all to the lat header) = 13 links → fractal
    // heap rows 0-3 (row ≥ 2 blocks double in size), and a node size
    // small enough to push the name index past a root leaf:
    //   node 64 B → 4 recs/leaf → depth 1 (root BTIN over 3 leaves)
    //   node 48 B → 3 recs/leaf, 1 rec/internal → depth 2 (7 nodes)
    // Every link must be enumerated through the internal-node walk and
    // every dataset must decode identically to the compact variant.
    val lat = Array(10.0, 10.5, 11.0, 11.5)
    val lon = Array(20.0, 20.25, 20.5, 20.75, 21.0)
    val scale = 0.5; val offset = 2.0; val fill = -999.0f
    val expect = Array.tabulate(20)(k => k * 0.5 - 1.0)
    val packed = expect.map(v => ((v - offset) / scale).toFloat)
    val attList = Seq("scale_factor" -> scale, "add_offset" -> offset,
      "_FillValue" -> fill.toDouble)
    val extraNames = (0 until 10).map(i => f"x$i%02d").toSet
    for ((nodeSize, wantDepth) <- Seq((64, 1), (48, 2))) {
      val p = Files.createTempFile(s"graft_btin_$nodeSize", ".nc").toString
      MiniHdf5.writeGridV2(p, "elevation", lat, lon, packed,
        chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
        atts = attList, denseRoot = true, denseExtraLinks = 10,
        denseNodeSize = nodeSize)
      val h5 = graft.sources.geo.Hdf5Reader.open(p)
      assert(h5.datasets.keySet == Set("elevation", "lat", "lon") ++ extraNames,
        s"node=$nodeSize (depth $wantDepth)")
      val g = GridLoader.fromNetcdf(p, "elevation")
      for (i <- 0 until 4; j <- 0 until 5)
        assert(g.valueAt(i, j) == expect(i * 5 + j),
          s"BTIN node=$nodeSize ($i,$j)")
      // the extra links are real hard links to the lat dataset
      val latVals = h5.readDoubles("lat")
      assert(h5.readDoubles("x07").sameElements(latVals), s"node=$nodeSize x07")
    }
  }

  test("Extensible Array chunk index (unlimited record dim) reads equal to Fixed Array") {
    // the same grid under the ONE-unlimited-dim index h5py/netCDF write
    // for record dimensions: layout v4 type 4, EAHD → EAIB with the
    // first elements inline plus direct EADB data blocks. Fixture
    // geometry (idxElmts 4, minElmts 2, minPtrs 4) forces 9-20 chunks
    // through index-block elements AND several doubling data blocks —
    // partially-filled tail block included. Filtered (client 1,
    // deflate+shuffle) and raw (client 0) both decode cell-identical
    // to the Fixed Array encoding of the same data.
    val lat = Array(10.0, 10.5, 11.0, 11.5, 12.0, 12.5)
    val lon = Array(20.0, 20.25, 20.5, 20.75, 21.0)
    val scale = 0.25; val offset = 4.0; val fill = -999.0f
    val expect = Array.tabulate(30) { k =>
      if (k % 7 == 3) Double.NaN else (k * 0.25) - 2.0
    }
    val packed = expect.map(v =>
      if (v.isNaN) fill else ((v - offset) / scale).toFloat)
    val attList = Seq("scale_factor" -> scale, "add_offset" -> offset,
      "_FillValue" -> fill.toDouble)
    // chunk grids: 3x3=9 chunks (EAIB elements + 2 data blocks),
    // 2x1 -> 3x5=15 chunks, 1x1 -> 6x5=30 chunks (4 data blocks)
    for ((cr, cc, defl, shuf) <- Seq((2, 2, true, true), (2, 2, false, false),
      (2, 1, true, false), (1, 1, false, false))) {
      val p = Files.createTempFile(s"graft_ea_${cr}_${cc}_$defl", ".nc").toString
      MiniHdf5.writeGridV2(p, "elevation", lat, lon, packed,
        chunkRows = cr, chunkCols = cc, deflate = defl, shuffle = shuf,
        atts = attList, eaIndex = true)
      val g = GridLoader.fromNetcdf(p, "elevation")
      assert(g.nLat == 6 && g.nLon == 5)
      for (i <- 0 until 6; j <- 0 until 5) {
        val (a, b) = (expect(i * 5 + j), g.valueAt(i, j))
        assert((a.isNaN && b.isNaN) || a == b,
          s"EA ($i,$j) chunks=${cr}x$cc deflate=$defl: want $a got $b")
      }
    }

    // EASB super blocks: tiny creation params (idxElmts 1, minElmts 1,
    // minPtrs 2 -> only 4 elements reachable from the index block) push
    // the same 30 single-cell chunks through THREE EASB super blocks
    // with doubling data blocks, partial tail block included
    for (defl <- Seq(true, false)) {
      val p = Files.createTempFile(s"graft_easb_$defl", ".nc").toString
      MiniHdf5.writeGridV2(p, "elevation", lat, lon, packed,
        chunkRows = 1, chunkCols = 1, deflate = defl, shuffle = defl,
        atts = attList, eaIndex = true,
        eaIdxElmts = 1, eaMinElmts = 1, eaMinPtrs = 2)
      val g = GridLoader.fromNetcdf(p, "elevation")
      for (i <- 0 until 6; j <- 0 until 5) {
        val (a, b) = (expect(i * 5 + j), g.valueAt(i, j))
        assert((a.isNaN && b.isNaN) || a == b,
          s"EASB ($i,$j) deflate=$defl: want $a got $b")
      }
    }
  }

  test("paged Fixed Array and Extensible Array data blocks decode " +
    "cell-identical to their unpaged encodings") {
    val lat = Array(10.0, 10.5, 11.0, 11.5, 12.0, 12.5)
    val lon = Array(20.0, 20.25, 20.5, 20.75, 21.0)
    val scale = 0.25; val offset = 4.0; val fill = -999.0f
    val expect = Array.tabulate(30) { k =>
      if (k % 7 == 3) Double.NaN else (k * 0.25) - 2.0
    }
    val packed = expect.map(v =>
      if (v.isNaN) fill else ((v - offset) / scale).toFloat)
    val attList = Seq("scale_factor" -> scale, "add_offset" -> offset,
      "_FillValue" -> fill.toDouble)
    def check(p: String, tag: String): Unit = {
      val g = GridLoader.fromNetcdf(p, "elevation")
      assert(g.nLat == 6 && g.nLon == 5)
      for (i <- 0 until 6; j <- 0 until 5) {
        val (a, b) = (expect(i * 5 + j), g.valueAt(i, j))
        assert((a.isNaN && b.isNaN) || a == b,
          s"$tag ($i,$j): want $a got $b")
      }
    }
    // Fixed Array, 2^2-element pages: 30 single-cell chunks → 8 pages
    // (7 full + truncated tail), client 0 and 1
    for (defl <- Seq(true, false)) {
      val p = Files.createTempFile(s"graft_fa_paged_$defl", ".nc").toString
      MiniHdf5.writeGridV2(p, "elevation", lat, lon, packed,
        chunkRows = 1, chunkCols = 1, deflate = defl, shuffle = defl,
        atts = attList, faPageBits = 2)
      check(p, s"FA-paged deflate=$defl")
    }
    // Extensible Array, 2^1-element pages: the tiny creation params
    // route super blocks 3/4's four-element data blocks through TWO
    // pages each (the EASB walk plus paging in one fixture)
    for (defl <- Seq(true, false)) {
      val p = Files.createTempFile(s"graft_ea_paged_$defl", ".nc").toString
      MiniHdf5.writeGridV2(p, "elevation", lat, lon, packed,
        chunkRows = 1, chunkCols = 1, deflate = defl, shuffle = defl,
        atts = attList, eaIndex = true,
        eaIdxElmts = 1, eaMinElmts = 1, eaMinPtrs = 2, eaPageBits = 1)
      check(p, s"EA-paged deflate=$defl")
    }
  }

  test("soft links resolve in all three root layouts (old-style symbol " +
    "table, compact, dense); chains follow; dangling/nested fail loudly") {
    val lat = Array(10.0, 10.5, 11.0)
    val lon = Array(20.0, 20.25)
    val packed = Array.tabulate(6)(k => k.toFloat)
    val atts = Seq("scale_factor" -> 1.0, "add_offset" -> 0.0)

    def cells(p: String, name: String): Seq[Double] = {
      val h5 = graft.sources.geo.Hdf5Reader.open(p)
      h5.readDoubles(name).toSeq
    }

    // old-style (superblock v0, SNOD cache-type-2 symbolic link)
    val p0 = Files.createTempFile("graft_soft_v0", ".nc").toString
    MiniHdf5.writeGrid(p0, "elevation", lat, lon, packed,
      softLink = Some(("alias", "/elevation")))
    assert(cells(p0, "alias") == cells(p0, "elevation"))

    // v2 compact Link messages: absolute + relative + a 2-hop chain
    val p1 = Files.createTempFile("graft_soft_v2", ".nc").toString
    MiniHdf5.writeGridV2(p1, "elevation", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, softLinks = Seq(("alias", "/elevation"),
        ("rel", "elevation"), ("hop2", "/alias")))
    val h1 = graft.sources.geo.Hdf5Reader.open(p1)
    Seq("alias", "rel", "hop2").foreach { n =>
      assert(h1.readDoubles(n).toSeq == h1.readDoubles("elevation").toSeq)
    }

    // dense root (fractal heap + name index) holding a soft link as a
    // managed heap object
    val p2 = Files.createTempFile("graft_soft_dense", ".nc").toString
    MiniHdf5.writeGridV2(p2, "elevation", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, denseRoot = true,
      softLinks = Seq(("alias", "/elevation")))
    assert(cells(p2, "alias") == cells(p2, "elevation"))

    // dangling target: loud, names the link
    val p3 = Files.createTempFile("graft_soft_dangle", ".nc").toString
    MiniHdf5.writeGridV2(p3, "elevation", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, softLinks = Seq(("bad", "/nope")))
    val e1 = intercept[IllegalArgumentException] {
      graft.sources.geo.Hdf5Reader.open(p3)
    }
    assert(e1.getMessage.contains("dangles") && e1.getMessage.contains("'bad'"))

    // nested-path target: loud, states the root-level contract
    val p4 = Files.createTempFile("graft_soft_nested", ".nc").toString
    MiniHdf5.writeGridV2(p4, "elevation", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, softLinks = Seq(("deep", "/group/inner")))
    assert(intercept[IllegalArgumentException] {
      graft.sources.geo.Hdf5Reader.open(p4)
    }.getMessage.contains("root-level"))

    // cycle: loud, bounded hops
    val p5 = Files.createTempFile("graft_soft_cycle", ".nc").toString
    MiniHdf5.writeGridV2(p5, "elevation", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, softLinks = Seq(("c1", "/c2"), ("c2", "/c1")))
    assert(intercept[IllegalArgumentException] {
      graft.sources.geo.Hdf5Reader.open(p5)
    }.getMessage.contains("hops"))
  }

  test("v2 B-tree chunk index (several unlimited dims) reads equal to Fixed Array") {
    // the same grid with BOTH dims unlimited — the dataspace that makes
    // the library pick a layout-v4 type-5 (v2 B-tree) chunk index.
    // 72-byte nodes force internal-node walks in the CHUNK flavor too:
    // type-10 records (24 B) → 2/leaf → depth scales with chunk count
    // (30 single-cell chunks → depth 4); type-11 filtered records
    // (29 B, 1-byte chunk sizes) → depth 2 at 9 chunks. Every decode
    // must equal the Fixed Array encoding of the same data.
    val lat = Array(10.0, 10.5, 11.0, 11.5, 12.0, 12.5)
    val lon = Array(20.0, 20.25, 20.5, 20.75, 21.0)
    val scale = 0.25; val offset = 4.0; val fill = -999.0f
    val expect = Array.tabulate(30) { k =>
      if (k % 7 == 3) Double.NaN else (k * 0.25) - 2.0
    }
    val packed = expect.map(v =>
      if (v.isNaN) fill else ((v - offset) / scale).toFloat)
    val attList = Seq("scale_factor" -> scale, "add_offset" -> offset,
      "_FillValue" -> fill.toDouble)
    for ((cr, cc, defl, shuf) <- Seq((2, 2, true, true), (2, 2, false, false),
      (2, 1, true, false), (1, 1, false, false))) {
      val p = Files.createTempFile(s"graft_bt2_${cr}_${cc}_$defl", ".nc").toString
      MiniHdf5.writeGridV2(p, "elevation", lat, lon, packed,
        chunkRows = cr, chunkCols = cc, deflate = defl, shuffle = shuf,
        atts = attList, bt2Index = true)
      val g = GridLoader.fromNetcdf(p, "elevation")
      assert(g.nLat == 6 && g.nLon == 5)
      for (i <- 0 until 6; j <- 0 until 5) {
        val (a, b) = (expect(i * 5 + j), g.valueAt(i, j))
        assert((a.isNaN && b.isNaN) || a == b,
          s"bt2 ($i,$j) chunks=${cr}x$cc deflate=$defl: want $a got $b")
      }
    }
  }

  test("lookup3 name hash matches the published self-test vectors") {
    // vectors from Bob Jenkins' lookup3.c self-test (public domain)
    assert(MiniHdf5.lookup3(Array.emptyByteArray, 0) == 0xdeadbeef)
    val four = "Four score and seven years ago".getBytes("US-ASCII")
    assert(MiniHdf5.lookup3(four, 0) == 0x17770551)
    assert(MiniHdf5.lookup3(four, 1) == 0xcd628161)
  }

  test("fractal heap doubling table: rows double block size, offsets map through headers") {
    // geometry: width 4, start 64 → rows 0,1 hold 4×64 B; row 2 128 B;
    // row 3 256 B. blockAddrs are synthetic file positions; the heap
    // offset of an object includes its block's own header bytes.
    val heap = graft.sources.geo.Hdf5Reader.FractalHeap(
      offBytes = 4, lenBytes = 2, width = 4, startBlock = 64L,
      blockAddrs = (0 until 16).map(k => 10000L + k * 1000L))
    val p = "t"
    // row 0: offsets [0, 256) in 64 B blocks
    assert(heap.fileAddr(0L, p) == 10000)
    assert(heap.fileAddr(63L, p) == 10063)
    assert(heap.fileAddr(64L, p) == 11000)     // block 1
    assert(heap.fileAddr(255L, p) == 13063)    // block 3, last byte
    // row 1: offsets [256, 512), still 64 B blocks
    assert(heap.fileAddr(256L, p) == 14000)    // block 4
    assert(heap.fileAddr(300L, p) == 14044)
    assert(heap.fileAddr(511L, p) == 17063)    // block 7, last byte
    // row 2: offsets [512, 1024) in 128 B blocks
    assert(heap.fileAddr(512L, p) == 18000)    // block 8
    assert(heap.fileAddr(700L, p) == 19060)    // block 9 (640+60)
    // row 3: offsets [1024, 2048) in 256 B blocks
    assert(heap.fileAddr(1024L, p) == 22000)   // block 12
    assert(heap.fileAddr(1400L, p) == 23120)   // block 13 (1280+120)
    // unallocated (Undef) block rejects loudly
    val holey = heap.copy(blockAddrs = heap.blockAddrs.updated(2, -1L))
    intercept[IllegalArgumentException] { holey.fileAddr(130L, p) }
  }

  test("f32 grid loader + native bilinear matches the synthetic grid expression") {
    // dump the synthetic grid formula to raw f32, reload, compare lookups
    val nLat = 61; val nLon = 61
    val values = new Array[Float](nLat * nLon)
    for (i <- 0 until nLat; j <- 0 until nLon)
      values(i * nLon + j) = (((i * 7 + j * 13) % 100) - 80).toFloat
    val buf = ByteBuffer.allocate(values.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(buf.putFloat)
    val f = Files.createTempFile("graft_grid", ".f32")
    Files.write(f, buf.array())
    val grid = GridLoader.fromF32(f.toString, 50.0, 0.05, nLat, 2.0, 0.05, nLon)

    import spark.implicits._
    val pts = Seq((51.234, 2.789), (50.001, 2.001), (52.9, 4.9)).toDF("lat", "lon")
    val rows = pts.select(
      Geo.gridElevationFrom(grid, col("lat"), col("lon")).as("loaded"),
      Geo.gridElevation(col("lat"), col("lon")).as("synthetic")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"bilinear mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
    // outside the grid => null (flag_on_nan path)
    val out = Seq((10.0, 10.0)).toDF("lat", "lon")
      .select(Geo.gridElevationFrom(grid, col("lat"), col("lon"))).collect()
    assert(out(0).isNullAt(0))
  }

  test("dense links: tiny and direct-huge heap IDs decode alongside managed") {
    // An 18-byte-ID heap mixes all three written ID forms in one name
    // index: "temperature" (22-byte link message → managed), "lat"/
    // "lon" + a soft link (≤ 16 bytes → tiny, message inline in the
    // ID), and "x00" forced huge (message outside the heap, ID =
    // address + length). Every form must enumerate and every dataset
    // decode identically to the compact layout of the same grid.
    val lat = Array(10.0, 10.5, 11.0, 11.5)
    val lon = Array(20.0, 20.25, 20.5, 20.75, 21.0)
    val scale = 0.5; val offset = 2.0
    val expect = Array.tabulate(20)(k => k * 0.5 - 1.0)
    val packed = expect.map(v => ((v - offset) / scale).toFloat)
    val atts = Seq("scale_factor" -> scale, "add_offset" -> offset)
    val p = Files.createTempFile("graft_tinyhuge", ".nc").toString
    MiniHdf5.writeGridV2(p, "temperature", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, denseRoot = true, denseIdWide = true,
      denseExtraLinks = 1, hugeNames = Set("x00"),
      softLinks = Seq(("al", "/lat")))
    val h5 = graft.sources.geo.Hdf5Reader.open(p)
    assert(h5.datasets.keySet ==
      Set("temperature", "lat", "lon", "x00", "al"))
    val g = GridLoader.fromNetcdf(p, "temperature")
    for (i <- 0 until 4; j <- 0 until 5)
      assert(g.valueAt(i, j) == expect(i * 5 + j), s"tiny/huge ($i,$j)")
    // tiny soft link and huge hard link both land on the lat dataset
    val latVals = h5.readDoubles("lat")
    assert(h5.readDoubles("al").sameElements(latVals))
    assert(h5.readDoubles("x00").sameElements(latVals))
    // every link huge: enumeration entirely outside the heap blocks
    val pm = Files.createTempFile("graft_allhuge", ".nc").toString
    MiniHdf5.writeGridV2(pm, "temperature", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, denseRoot = true, denseIdWide = true,
      hugeNames = Set("temperature", "lat", "lon"))
    assert(graft.sources.geo.Hdf5Reader.open(pm).datasets.keySet ==
      Set("temperature", "lat", "lon"))

    // INDIRECT huge: the IDs carry huge-object ids resolved through the
    // heap's type-1 v2 B-tree instead of inline (address, length). The
    // library only writes this form when the heap ID is too narrow for
    // addr+len (idLen < 17 — H5HFhdr.c keys huge_ids_direct on that),
    // so the fixture uses a 16-byte ID
    val pi = Files.createTempFile("graft_indhuge", ".nc").toString
    MiniHdf5.writeGridV2(pi, "temperature", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, denseRoot = true, denseIdWide = true, denseIdLen = 16,
      denseExtraLinks = 2, hugeNames = Set("x00", "x01"),
      hugeIndirect = true)
    val hi = graft.sources.geo.Hdf5Reader.open(pi)
    assert(hi.datasets.keySet ==
      Set("temperature", "lat", "lon", "x00", "x01"))
    assert(hi.readDoubles("x01").sameElements(hi.readDoubles("lat")))
    val gi = GridLoader.fromNetcdf(pi, "temperature")
    for (i <- 0 until 4; j <- 0 until 5)
      assert(gi.valueAt(i, j) == expect(i * 5 + j), s"indirect ($i,$j)")

    // EXTENDED tiny (heap ID length > 18: two-byte inline length) —
    // "temperature"'s 22-byte message rides inline at idLen 24, the
    // 13-char extra link's 24-byte message exceeds the 22-byte inline
    // room and stays managed: both sub-types in one index
    val pe = Files.createTempFile("graft_exttiny", ".nc").toString
    MiniHdf5.writeGridV2(pe, "temperature", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, denseRoot = true, denseIdWide = true, denseIdLen = 24,
      softLinks = Seq(("averylongalias", "/temperature")))
    val he = graft.sources.geo.Hdf5Reader.open(pe)
    assert(he.datasets.keySet ==
      Set("temperature", "lat", "lon", "averylongalias"))
    val ge = GridLoader.fromNetcdf(pe, "temperature")
    for (i <- 0 until 4; j <- 0 until 5)
      assert(ge.valueAt(i, j) == expect(i * 5 + j), s"exttiny ($i,$j)")

    // EXTENDED tiny, 12-bit length path: a > 255-byte inline payload
    // puts nonzero bits in the flag nibble's HIGH length bits
    // (H5HFtiny.c packs len-1 as nibble<<8 | second byte — a decoder
    // that ORs the nibble into the LOW bits truncates this payload to
    // its low byte and misparses the message from the wrong offset)
    val longAlias = "z" * 260
    val pe2 = Files.createTempFile("graft_exttiny12", ".nc").toString
    MiniHdf5.writeGridV2(pe2, "temperature", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, denseRoot = true, denseIdWide = true,
      denseIdLen = 320, denseNodeSize = 2048,
      softLinks = Seq((longAlias, "/temperature")))
    val he2 = graft.sources.geo.Hdf5Reader.open(pe2)
    assert(he2.datasets.keySet ==
      Set("temperature", "lat", "lon", longAlias))
    val ge2 = GridLoader.fromNetcdf(pe2, "temperature")
    for (i <- 0 until 4; j <- 0 until 5)
      assert(ge2.valueAt(i, j) == expect(i * 5 + j), s"exttiny12 ($i,$j)")
  }

  test("superblock extension: bookkeeping messages accepted, shared " +
    "message table and unknown types loud") {
    val lat = Array(10.0, 10.5, 11.0, 11.5)
    val lon = Array(20.0, 20.25, 20.5, 20.75, 21.0)
    val expect = Array.tabulate(20)(k => k * 0.5 - 1.0)
    val packed = expect.map(v => ((v - 2.0) / 0.5).toFloat)
    val atts = Seq("scale_factor" -> 0.5, "add_offset" -> 2.0)
    // File Space Info + Driver Info: bookkeeping the library writes
    // routinely under H5F_LIBVER_LATEST — must not change a single cell
    val p = Files.createTempFile("graft_sbext", ".nc").toString
    MiniHdf5.writeGridV2(p, "elevation", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, sbExtMessages = Seq(
        (0x0017, Array.fill[Byte](14)(1)),   // File Space Info
        (0x0014, Array.fill[Byte](24)(2)))) // Driver Info
    val g = GridLoader.fromNetcdf(p, "elevation")
    for (i <- 0 until 4; j <- 0 until 5)
      assert(g.valueAt(i, j) == expect(i * 5 + j), s"sbext ($i,$j)")
    // Shared Message Table: the extension message that WOULD change how
    // other messages decode — loud, names the hatch
    val ps = Files.createTempFile("graft_sbext_sohm", ".nc").toString
    MiniHdf5.writeGridV2(ps, "elevation", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, sbExtMessages = Seq((0x000F, Array.fill[Byte](13)(0))))
    val e = intercept[IllegalArgumentException] {
      graft.sources.geo.Hdf5Reader.open(ps)
    }
    assert(e.getMessage.contains("Shared Message Table") &&
      e.getMessage.contains("nccopy"))
    // an extension message outside the bookkeeping allowlist: loud too
    val pu = Files.createTempFile("graft_sbext_unknown", ".nc").toString
    MiniHdf5.writeGridV2(pu, "elevation", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, sbExtMessages = Seq((0x002A, Array.fill[Byte](8)(0))))
    assert(intercept[IllegalArgumentException] {
      graft.sources.geo.Hdf5Reader.open(pu)
    }.getMessage.contains("superblock extension message type"))
  }
}
