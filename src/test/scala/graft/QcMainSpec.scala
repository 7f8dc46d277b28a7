package graft

import graft.core.Flags
import graft.ops.Geo
import graft.pipeline.QcMain
import org.apache.spark.sql.functions._

/** §3.1 lifecycle end-to-end on the reference's own captured STA JSON
  * fixture, with the six phase timings (reference `src/main.py:862-868`).
  */
class QcMainSpec extends SparkSpec {

  private val fixture = "/root/reference/tests/resources/aums_data_request_response.json"

  test("full pipeline on the reference fixture: flags, phases, patch file") {
    assume(new java.io.File(fixture).exists())
    val cfg = QcMain.Config(
      rangeBounds = Map(7751L -> (0.0, 20.0), 7770L -> (5.0, 30.0)),
      regions = Seq(Geo.BoxRegion("NORTH SEA", "SOUTHERN BIGHT", 51.0, 52.0, 2.5, 3.5)),
      stabilization = Seq(graft.core.StabilizationConf(7751L, 0.0, 20.0,
        dtStabilizationSec = 1200L, maxAllowedDowntimeSec = 900L)),
      dependents = Seq(graft.core.DependentConf(independentId = 7751L,
        dependentId = 7770L, dtToleranceUs = 500000L,
        secondaryRange = Some((0.0, 25.0)))))
    val out = java.nio.file.Files.createTempDirectory("qc_patch").toString
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val (flagged, phases) = QcMain.run(spark, fixture, cfg, patchOut = Some(out))

    // cache lifecycle: run() must release its intermediate stage caches;
    // the single surviving cached frame is the RETURNED one (caller-owned)
    val newlyCached = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(newlyCached.size <= 1,
      s"run() leaked intermediate caches: $newlyCached")

    val hist = flagged.groupBy(col("flag")).count().collect()
      .map(r => r.getByte(0) -> r.getLong(1)).toMap
    assert(hist.values.sum > 8000) // every observation flagged-or-passed
    // count-preserving: spatial-outlier rows must stay in the output
    // (flagged BAD), not be dropped by the kinematics input filter
    val inputRows = graft.sources.StaJson.readResponse(spark, fixture).count()
    assert(hist.values.sum == inputRows,
      s"pipeline dropped rows: in=$inputRows out=${hist.values.sum}")
    assert(hist.keys.exists(_ >= Flags.Good)) // at least some opinions
    // phase timing line is complete and ordered sanely
    assert(phases.totalSec >= phases.totalQcSec && phases.totalQcSec > 0)
    assert(phases.dfConstructionSec > 0 && phases.patchSec > 0)
    // patch file written with wire codes
    val patch = spark.read.json(out)
    assert(patch.count() == hist.values.sum)
    assert(patch.columns.toSet == Set("id", "resultQuality"))

    // releasing the returned frame leaves the session storage-clean
    flagged.unpersist()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore).isEmpty)
  }
}
