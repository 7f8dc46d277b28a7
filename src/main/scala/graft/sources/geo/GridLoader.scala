package graft.sources.geo

import graft.ops.Grid
import org.apache.spark.sql.SparkSession

/** Loaders for gridded elevation/bathymetry reference data →
  * [[graft.ops.Grid]] (driver-side float grid, shipped to executors as a
  * plan reference by `Geo.gridElevationFrom`).
  *
  * The reference loads a NetCDF bathymetry variable via xarray
  * (`/root/reference/src/main.py:561-571`). NetCDF *decoding* needs a
  * codec library not available here, so the loaders accept the two
  * lossless interchange forms any NetCDF tool emits in one line
  * (`ncdump`/xarray → CSV, or a raw float32 dump); the grid semantics,
  * broadcast shape, and bilinear lookup are the real production pieces.
  */
object GridLoader {

  /** CSV of `i,j,value` cell triples (row i = lat index, col j = lon
    * index) plus explicit geometry. Missing cells default to NaN (=>
    * null elevation => the flag_on_nan path).
    */
  def fromCsv(spark: SparkSession, path: String,
              lat0: Double, dLat: Double, nLat: Int,
              lon0: Double, dLon: Double, nLon: Int): Grid = {
    val values = Array.fill(nLat * nLon)(Float.NaN)
    spark.read.option("header", "true").csv(path)
      .select("i", "j", "value").collect().foreach { r =>
      val i = r.getString(0).trim.toInt
      val j = r.getString(1).trim.toInt
      // out-of-range j would silently alias into the next grid row via
      // the flat index; fail with the offending cell instead
      require(i >= 0 && i < nLat && j >= 0 && j < nLon,
        s"grid cell ($i,$j) outside ${nLat}x$nLon grid in $path")
      values(i * nLon + j) = r.getString(2).trim.toFloat
    }
    new Grid(lat0, dLat, nLat, lon0, dLon, nLon, values)
  }

  /** Classic NetCDF (CDF-1/CDF-2) bathymetry variable with its 1-D
    * coordinate axes — the reference's native grid format
    * (`get_elev_netcdf`, `/root/reference/src/main.py:560`). Pure-JVM
    * header parser ([[NetcdfReader]]); applies scale/offset/fill the
    * way xarray decodes ETOPO-style grids. NetCDF-4 (HDF5) containers
    * are detected by magic and routed to [[Hdf5Reader]] (contiguous
    * uncompressed grids; chunked/compressed files get a clear error
    * naming the `nccopy` conversion).
    */
  def fromNetcdf(path: String, varName: String,
                 latVar: String = "lat", lonVar: String = "lon"): Grid =
    NetcdfReader.grid(path, varName, latVar, lonVar)

  /** Raw little-endian float32 dump, row-major [iLat][iLon] — e.g.
    * `xarray.DataArray.values.astype('<f4').tofile(...)`.
    */
  def fromF32(path: String,
              lat0: Double, dLat: Double, nLat: Int,
              lon0: Double, dLon: Double, nLon: Int): Grid = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    require(bytes.length == nLat * nLon * 4,
      s"grid size mismatch: ${bytes.length} bytes for $nLat x $nLon floats")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val values = new Array[Float](nLat * nLon)
    buf.asFloatBuffer().get(values)
    new Grid(lat0, dLat, nLat, lon0, dLon, nLon, values)
  }
}
