package graft.ops

import graft.core.{Flags, Obs}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W4 — spatial outlier vs. rolling median position (reference
  * `get_bool_spacial_outlier_compared_to_median`, call
  * `src/main.py:612-630`, `README.adoc:231-239`, pinned exhaustively by
  * the perturbation tests `tests/test_qc.py:263-392`): take the rolling
  * *median* of lat and long over a centered time window; flag the point
  * BAD when its distance to the median position exceeds
  * `max_dx_dt × window_seconds`. The median (vs. mean) is what makes it
  * robust to single/double spikes, zeros, and lat/long swaps.
  *
  * Scale note: exact `median` over a time-range window is an imperative
  * aggregate (no codegen) but stays one-pass per stream; at 100 TB either
  * keep it (window sizes are bounded: minutes of seconds-cadence data,
  * so O(window) per row memory is capped) or switch `exact=false` to
  * `percentile_approx`, which the perturbation fixtures also pass.
  */
object SpatialOutlier {

  def apply(df: DataFrame, lat: Column, lon: Column, epochUs: Column,
            windowSec: Long, maxDxDt: Double,
            partCols: Seq[String] = Seq.empty,
            exact: Boolean = true): DataFrame = {
    val half = windowSec * 1000000L / 2
    val base = if (partCols.isEmpty) Window.orderBy(epochUs)
    else Window.partitionBy(partCols.map(col): _*).orderBy(epochUs)
    val w = base.rangeBetween(-half, half)
    // Exact rolling median: Spark's `median`/`percentile` aggregates refuse
    // explicit window frames, so collect the frame and take the middle —
    // interpolating even counts exactly like pandas / DuckDB `median`.
    // Frame sizes are bounded (minutes of data), so the per-row list is
    // small; `exact=false` switches to percentile_approx at scale.
    def med(c: Column): Column =
      if (exact) {
        val sorted = array_sort(collect_list(c).over(w))
        val n = size(sorted)
        val lo = element_at(sorted, ((n + 1) / 2).cast("int"))
        val hi = element_at(sorted, (n / 2 + 1).cast("int"))
        (lo + hi) / 2.0
      } else percentile_approx(c, lit(0.5), lit(10000)).over(w)
    val maxDistM = maxDxDt * windowSec
    df.withColumn("median_lat", med(lat))
      .withColumn("median_lon", med(lon))
      .withColumn("dist_to_median_m",
        Geo.haversineM(lat, lon, col("median_lat"), col("median_lon")))
      .withColumn("is_spatial_outlier", col("dist_to_median_m") > maxDistM)
  }

  def asCheck(): QcCheck =
    QcCheck("spatial_outlier", col("is_spatial_outlier"), Flags.Bad)
}
