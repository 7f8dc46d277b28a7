package graft.pipeline

import graft.core.{Flags, Obs, QcConfig}
import graft.ops._
import graft.sources.{PatchSink, StaJson}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The full QC pipeline lifecycle (reference `src/main.py` §3.1):
  * fetch/flatten → stabilization → geo pass → kinematics → value pass
  * (range/gradient/z-score) → dependent pass → patch sink; with the
  * reference's six phase wall-times logged (`src/main.py:862-868`:
  * df-construction, region, ranges, total QC, patch, total).
  *
  * Spark shape: one DataFrame lineage, actions only at the sink and the
  * audit counts; independent checks merge worst-wins (associative, so
  * Catalyst may reorder them), while the semantic orderings —
  * z-score over still-good rows, velocity over outlier-free rows —
  * are preserved by explicit filters (SURVEY §7.4.6).
  */
object QcMain {

  final case class PhaseTimes(dfConstructionSec: Double, regionSec: Double,
                              rangesSec: Double, totalQcSec: Double,
                              patchSec: Double, totalSec: Double)

  final case class Config(
      rangeBounds: Map[Long, (Double, Double)] = Map.empty,
      gradientBounds: (Double, Double) = (-1.0, 1.0),
      zscoreBounds: (Double, Double) = (-3.0, 3.0),
      zscoreWindowSec: Long = 3600L,
      outlierWindowSec: Long = 600L, // reference location.time_window: 10min
      outlierMaxDxDt: Double = 6.89, // reference conf max_dx_dt
      regions: Seq[Geo.BoxRegion] = Seq.empty,
      depthThreshold: Double = 0.0,
      /** §3.1 step 6 — kinematic limits (reference conf max_dx_dt /
        * max_ddx_dtdt, src/main.py:663-710); None = check off
        */
      maxVelocityMs: Option[Double] = Some(6.89),
      maxAccelerationMs2: Option[Double] = Some(0.15),
      /** §3.1 step 4 — per-independent-stream stabilization configs */
      stabilization: Seq[graft.core.StabilizationConf] = Seq.empty,
      /** §3.1 step 8 — dependent-quantity propagation configs */
      dependents: Seq[graft.core.DependentConf] = Seq.empty)

  /** Run the pipeline on a captured STA response; returns the flagged
    * frame and the phase timing line.
    */
  def run(spark: SparkSession, staJsonPath: String, cfg: Config,
          patchOut: Option[String] = None): (DataFrame, PhaseTimes) =
    runFrom(spark, StaJson.readResponse(spark, staJsonPath), cfg, patchOut)

  /** The same lifecycle from an already-loaded observations frame (the
    * long schema both [[StaJson.readResponse]] and the live
    * `graft.sources.sta` HTTP source produce) — the entry the live
    * transport composes with: source pushdown happens in the PLAN of
    * `obsIn` before this cache materializes it.
    */
  /** §3.1 step 4 — stabilization pass: per configured independent
    * stream, BAD during warm-up after long outages; worst-wins
    * re-merged onto the full frame by observation id (reference
    * src/main.py:409-494). No-op when unconfigured.
    */
  private[graft] def stabPass(spark: SparkSession, obs: DataFrame,
                              cfg: Config): DataFrame =
    if (cfg.stabilization.isEmpty) obs else {
      val stabConf = {
        import spark.implicits._
        cfg.stabilization.map(s => (s.datastreamId, s.rangeMin, s.rangeMax,
          s.maxAllowedDowntimeSec.toDouble * 1e6, s.dtStabilizationSec.toDouble * 1e6))
          .toDF(Obs.DatastreamId, "st_min", "st_max", "st_down_us", "st_stab_us")
      }
      val sub = obs.join(broadcast(stabConf), Seq(Obs.DatastreamId))
      val flaggedSub = Stabilization(sub, col(Obs.Result), col("t_us").cast("double"),
        col("st_min"), col("st_max"), col("st_down_us"), col("st_stab_us"),
        partCols = Seq(Obs.DatastreamId), timeCol = "t_us")
        .select(col(Obs.IotId), col("stab_flag"))
      obs.join(flaggedSub, Seq(Obs.IotId), "left")
        .withColumn(Obs.QcFlag, Flags.worstWins(col(Obs.QcFlag), col("stab_flag")))
        .drop("stab_flag")
    }

  /** §3.1 steps 5-7a — geo pass: region classify + null-region/
    * mainland/depth folded per feature, then the spatial outlier
    * window. Geospatial checks flag the FEATURE (the shared geometry
    * entity), and the per-feature flag folds into every observation at
    * that feature (reference src/main.py:587-592,625-630); a window
    * over feature_id expresses the fold with no extra join.
    */
  private[graft] def geoPass(afterStab: DataFrame, cfg: Config): DataFrame = {
    val withRegion = afterStab
      .withColumn("region", Geo.classifyRegion(col(Obs.Lat), col(Obs.Long_), cfg.regions))
      .withColumn("elev", Geo.gridElevation(col(Obs.Lat), col(Obs.Long_)))
    val geoChecks = Seq(
      Geo.nullRegionCheck(col("region")),
      Geo.mainlandCheck(col("region")),
      Geo.depthCheck(col("elev"), cfg.depthThreshold))
    val perRowGeoFlag = geoChecks.map(_.flagCol).reduce(Flags.worstWins(_, _))
    val wFeature = Window.partitionBy(col(Obs.FeatureId))
    val geoFlagged = withRegion
      .withColumn(Obs.QcFlagFeature, max(perRowGeoFlag).over(wFeature))
      .withColumn("flag", Flags.worstWins(col(Obs.QcFlag), col(Obs.QcFlagFeature)))
    SpatialOutlier(geoFlagged, col(Obs.Lat), col(Obs.Long_),
      col("t_us"), cfg.outlierWindowSec, cfg.outlierMaxDxDt,
      partCols = Seq(Obs.DatastreamId))
      .withColumn("flag", SpatialOutlier.asCheck().mergedInto(col("flag")))
  }

  /** §3.1 step 6 — kinematics on outlier-free rows (reference
    * src/main.py:654-660): velocity/acceleration limits flag BOTH
    * endpoints of an offending segment (pinned tests/test_qc.py:
    * 395-435). Only the kinematic *inputs* exclude spatial outliers —
    * the outlier rows themselves stay in the frame, already flagged BAD
    * above, and reach the sink (reference keeps them in df_all and
    * patches them, src/main.py:611-660,854-859): the flags computed on
    * the clean subset are re-joined onto the full frame by observation
    * id.
    */
  private[graft] def kinPass(withOutlier: DataFrame, cfg: Config): DataFrame = {
    val w = Window.partitionBy(col(Obs.DatastreamId)).orderBy(col("t_us"), col(Obs.IotId))
    val kinChecks =
      cfg.maxVelocityMs.map(m => QcCheck("max_velocity",
        WindowKernels.exceedsOnEitherEndpoint(col("velocity_ms"), m, w), Flags.Bad)).toSeq ++
      cfg.maxAccelerationMs2.map(m => QcCheck("max_acceleration",
        WindowKernels.exceedsOnEitherEndpoint(col("acceleration_ms2"), m, w), Flags.Bad)).toSeq
    if (kinChecks.isEmpty) withOutlier else {
      val isOut = coalesce(col("is_spatial_outlier"), lit(false))
      val clean = withOutlier.filter(!isOut)
      val kin0 = WindowKernels.velocityAcceleration(clean, w,
        col(Obs.Lat), col(Obs.Long_), col("t_us"))
      val kinFlagged = kinChecks.foldLeft(kin0) { (d, c) =>
        d.withColumn("flag", c.mergedInto(col("flag")))
      }.drop("dt_sec", "velocity_ms", "acceleration_ms2")
      // union (not a join back on iot_id): both branches are narrow maps
      // over the cached frame, and the next window pass re-shuffles by
      // stream anyway — no extra shuffle for re-attaching outlier rows
      kinFlagged.unionByName(withOutlier.filter(isOut))
    }
  }

  /** §3.1 step 7b — value pass: range → gradient → z-score on
    * still-good rows. The z-score runs over still-good rows via a
    * conditional window (avg/stddev ignore nulls): same good-rows-only
    * statistics as a filter + join back on iot_id, with zero extra
    * shuffle.
    */
  private[graft] def valuePass(spark: SparkSession, kinematics: DataFrame,
                               cfg: Config): DataFrame = {
    val w = Window.partitionBy(col(Obs.DatastreamId)).orderBy(col("t_us"), col(Obs.IotId))
    val confDf = {
      import spark.implicits._
      cfg.rangeBounds.toSeq.map { case (ds, (lo, hi)) => (ds, lo, hi) }
        .toDF(Obs.DatastreamId, "qc_range_min", "qc_range_max")
    }
    val withConf = QcConfig.joinOnto(kinematics, confDf)
    val ranged = withConf.withColumn("flag",
      QcCheck("range",
        QcCheck.outOfRange(col(Obs.Result), col("qc_range_min"), col("qc_range_max")),
        Flags.Bad, onFalse = Some(Flags.Good), onNan = Some(Flags.NoQc))
        .mergedInto(col("flag")))
    val graded = WindowKernels.gradientOnto(ranged, "gradient",
        col(Obs.Result), col("t_us").cast("double") / 1e6, w)
      .withColumn("flag",
        QcCheck("gradient",
          QcCheck.outOfRange(col("gradient"),
            lit(cfg.gradientBounds._1), lit(cfg.gradientBounds._2)),
          Flags.ProbablyBad, onFalse = Some(Flags.Good), onNan = Some(Flags.NoQc))
          .mergedInto(col("flag")))
    // zscoreOnto, not the Column-form zscore: the guard+divisor form
    // pays THREE O(frame) sliding aggregates per row (Spark does not
    // dedupe identical window expressions); materializing mean/stddev
    // once drops that to two with bit-identical arithmetic — on the
    // sf10 century row this window chain is the lifecycle's dominant
    // cost (round-14 verdict #5)
    WindowKernels.zscoreOnto(graded, "zscore",
        when(col("flag") <= Flags.ProbablyGood, col(Obs.Result)),
        col("t_us"), cfg.zscoreWindowSec)
      .withColumn("flag_z",
        QcCheck("zscore",
          QcCheck.outOfRange(col("zscore"),
            lit(cfg.zscoreBounds._1), lit(cfg.zscoreBounds._2)),
          Flags.ProbablyBad, onFalse = Some(Flags.Good), onNan = Some(Flags.NoQc)).flagCol)
      .withColumn("flag", Flags.worstWins(col("flag"), col("flag_z")))
      .drop("flag_z")
  }

  /** §3.1 step 8 — dependent pass: per config entry, as-of propagate
    * the independent's flag and run the secondary value check
    * (reference src/main.py:771-805).
    */
  private[graft] def dependentPass(valueFlagged: DataFrame,
                                   cfg: Config): DataFrame =
    cfg.dependents.foldLeft(valueFlagged) { (d, dep) =>
      val indep = d.filter(col(Obs.DatastreamId) === dep.independentId)
        .select(col(Obs.IotId).as("i_id"), col("t_us").as("i_t_us"),
          col(Obs.Result).as("i_result"), col("flag").as("i_flag"))
      val depRows = d.filter(col(Obs.DatastreamId) === dep.dependentId)
      val matched = AsofJoin.nearest(depRows, indep, Seq.empty,
        leftTimeUs = "t_us", rightTimeUs = "i_t_us", toleranceUs = dep.dtToleranceUs,
        rightCols = Seq("i_id", "i_t_us", "i_result", "i_flag"),
        rightIdCol = Some("i_id"), leftIdCol = Some(Obs.IotId))
      val base = AsofJoin.propagateFlag(col("flag"), col("r_i_flag"), dep.flagWhenMissing)
      val withSecondary = dep.secondaryRange match {
        case Some((lo, hi)) =>
          matched.withColumn("flag",
            AsofJoin.secondaryValueCheck(base, col("r_i_result"), lo, hi))
        case None => matched.withColumn("flag", base)
      }
      val newDepFlags = withSecondary.select(col(Obs.IotId), col("flag").as("dep_flag"))
      d.join(newDepFlags, Seq(Obs.IotId), "left")
        .withColumn("flag", coalesce(col("dep_flag"), col("flag")))
        .drop("dep_flag")
    }

  def runFrom(spark: SparkSession, obsIn: DataFrame, cfg: Config,
              patchOut: Option[String] = None): (DataFrame, PhaseTimes) = {
    val t0 = System.nanoTime()
    def secsSince(t: Long): Double = (System.nanoTime() - t) / 1e9

    // 1. fetch + flatten (df-construction phase)
    val obs = obsIn
      .withColumn("t_us", unix_micros(col(Obs.Time)))
      .cache()
    obs.count() // materialize: the reference times df-construction as a phase
    val tDf = secsSince(t0)

    val afterStab = stabPass(spark, obs, cfg)

    val tRegion0 = System.nanoTime()
    val withOutlier = geoPass(afterStab, cfg)
    val regionSec = secsSince(tRegion0)

    val kinematics = kinPass(withOutlier, cfg)

    // 4. value pass: range → gradient → z-score on still-good rows
    val tRanges0 = System.nanoTime()
    val valueFlagged = valuePass(spark, kinematics, cfg)
    valueFlagged.cache().count() // close the "ranges" phase before dependents
    val rangesSecMeasured = secsSince(tRanges0)

    val flagged = dependentPass(valueFlagged, cfg).cache()
    flagged.count()
    // flagged is now materialized in its own cache; the intermediate
    // stage caches only existed to build it — release them so a
    // long-lived session (the cron/streaming shape) doesn't accumulate
    // storage. The RETURNED frame stays cached and is caller-owned:
    // unpersist it when done.
    obs.unpersist()
    valueFlagged.unpersist()
    val rangesSec = rangesSecMeasured
    val totalQcSec = secsSince(tRegion0)

    // 5. sink
    val tPatch0 = System.nanoTime()
    patchOut.foreach(out => PatchSink.writePatchFile(
      flagged.withColumn(Obs.QcFlag, col("flag")), out))
    val patchSec = secsSince(tPatch0)

    (flagged, PhaseTimes(tDf, regionSec, rangesSec, totalQcSec, patchSec, secsSince(t0)))
  }
}
