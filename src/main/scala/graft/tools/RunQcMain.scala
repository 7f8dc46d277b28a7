package graft.tools

import graft.ops.Geo
import graft.pipeline.QcMain
import org.apache.spark.sql.functions._

/** CLI driver for the §3.1 QC pipeline: runs on a captured STA response
  * and prints the reference-parity phase-timing line plus the flag
  * histogram. Usage: runMain graft.tools.RunQcMain <staJson> [patchOut]
  */
object RunQcMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    val cfg = QcMain.Config(
      rangeBounds = Map(7751L -> (0.0, 20.0), 7770L -> (5.0, 30.0)),
      regions = Seq(Geo.BoxRegion("NORTH SEA", "SOUTHERN BIGHT", 51.0, 52.0, 2.5, 3.5)),
      stabilization = Seq(graft.core.StabilizationConf(7751L, 0.0, 20.0,
        dtStabilizationSec = 1200L, maxAllowedDowntimeSec = 900L)),
      dependents = Seq(graft.core.DependentConf(independentId = 7751L,
        dependentId = 7770L, dtToleranceUs = 500000L,
        secondaryRange = Some((0.0, 25.0)))))
    val (flagged, phases) = QcMain.run(spark, args(0), cfg,
      patchOut = args.lift(1))
    println("FLAG HISTOGRAM " + flagged.groupBy(col("flag")).count()
      .collect().map(r => s"${r.getByte(0)}->${r.getLong(1)}").sorted.mkString(" "))
    println(f"PHASES df-construction=${phases.dfConstructionSec}%.2f region=${phases.regionSec}%.2f " +
      f"ranges=${phases.rangesSec}%.2f totalQC=${phases.totalQcSec}%.2f " +
      f"patch=${phases.patchSec}%.2f total=${phases.totalSec}%.2f")
    spark.stop()
  }
}
