package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** QC configuration model (reference `conf/config.yaml:185-516` +
  * `src/yaml_schema.py`): per-datastream bounds for each check family,
  * global defaults filled in where a stream omits them
  * (`QC_global`, reference `src/main.py:506-509`).
  *
  * The config materializes as a small DataFrame broadcast-joined onto the
  * observations on `datastream_id` (reference `src/main.py:500-516`) —
  * at 100 TB the observation side streams through while the ~hundreds-row
  * config side ships to every executor.
  */
final case class StreamQc(
    datastreamId: Long,
    rangeMin: Option[Double] = None,
    rangeMax: Option[Double] = None,
    gradientMin: Option[Double] = None,
    gradientMax: Option[Double] = None,
    zscoreMin: Option[Double] = None,
    zscoreMax: Option[Double] = None
)

final case class GlobalQc(
    rangeMin: Option[Double] = None,
    rangeMax: Option[Double] = None,
    gradientMin: Option[Double] = None,
    gradientMax: Option[Double] = None,
    zscoreMin: Option[Double] = None,
    zscoreMax: Option[Double] = None,
    /** rolling z-score window, seconds (reference `QC_global.zscore.time_window`) */
    zscoreWindowSec: Long = 3600L
)

final case class StabilizationConf(
    datastreamId: Long,
    rangeMin: Double,
    rangeMax: Double,
    /** BAD until this much uptime since the last long outage (reference `dt_stabilization: 20min`) */
    dtStabilizationSec: Long,
    /** outage counts as "long" above this (reference `max_allowed_downtime: 15min`) */
    maxAllowedDowntimeSec: Long
)

/** Dependent-quantity propagation config (reference `QC_dependent`,
  * `conf/config.yaml`, `README.adoc:257-268`).
  */
final case class DependentConf(
    independentId: Long,
    dependentId: Long,
    /** |Δt| tolerance for the as-of match, microseconds (reference `dt_tolerance: 0.5s`) */
    dtToleranceUs: Long,
    /** flag for dependent rows with no independent partner; None = leave untouched */
    flagWhenMissing: Option[Byte] = Some(Flags.Bad),
    /** independent-value range for the secondary check (reference QC.range) */
    secondaryRange: Option[(Double, Double)] = None
)

object QcConfig {

  /** Build the broadcastable per-stream config frame, with global defaults
    * coalesced in (reference `src/main.py:506-509`): stream bound if set,
    * else global bound, else null (null bounds => flag_on_nan path).
    */
  def toDf(spark: SparkSession, streams: Seq[StreamQc], global: GlobalQc = GlobalQc()): DataFrame = {
    import spark.implicits._
    def pick(s: Option[Double], g: Option[Double]): Option[Double] = s.orElse(g)
    val rows = streams.map { s =>
      (s.datastreamId,
        pick(s.rangeMin, global.rangeMin), pick(s.rangeMax, global.rangeMax),
        pick(s.gradientMin, global.gradientMin), pick(s.gradientMax, global.gradientMax),
        pick(s.zscoreMin, global.zscoreMin), pick(s.zscoreMax, global.zscoreMax))
    }
    rows.toDF(Obs.DatastreamId,
      "qc_range_min", "qc_range_max",
      "qc_gradient_min", "qc_gradient_max",
      "qc_zscore_min", "qc_zscore_max")
  }

  /** Left-join config onto observations; row count is preserved by
    * construction (left join on a unique key — the reference asserts this
    * at `src/main.py:720-721`). Broadcast: config is tiny, observations
    * are not.
    */
  def joinOnto(obs: DataFrame, conf: DataFrame): DataFrame =
    obs.join(broadcast(conf), Seq(Obs.DatastreamId), "left")
}
