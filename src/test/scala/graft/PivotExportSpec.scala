package graft

import graft.core.{Flags, Obs}
import graft.ops.{PivotExport, WindowKernels}
import org.apache.spark.sql.functions._

/** R1/R2/A4 — pivot/align/export path (reference
  * `src/aums_data_request.py:97-162`, golden `tests/resources/df_agg.csv`):
  * best row per (rounded time, stream) by (flag, nearness), wide pivot,
  * MISSING fill for absent cells.
  */
class PivotExportSpec extends SparkSpec {
  import spark.implicits._

  // two streams, observations straddling 1 s buckets, one flagged BAD
  private def obsDf = Seq(
    // (iot, ds, epoch_us, result, flag)
    (1L, 100L, 1000100000L, 10.0, Flags.Good),         // bucket 1000 s, dt .1
    (2L, 100L, 1000400000L, 11.0, Flags.Bad),          // same bucket, worse flag
    (3L, 100L, 999800000L, 12.0, Flags.Good),          // bucket 1000 s, dt .2
    (4L, 200L, 1000100000L, 20.0, Flags.ProbablyGood), // stream 200
    (5L, 200L, 2000000000L, 21.0, Flags.Good))         // bucket 2000 s
    .toDF(Obs.IotId, Obs.DatastreamId, "t_us", Obs.Result, Obs.QcFlag)
    .withColumn(Obs.QcFlag, col(Obs.QcFlag).cast("tinyint"))
    .withColumn(Obs.Time, timestamp_micros($"t_us"))
    .withColumn(Obs.Lat, lit(51.0)).withColumn(Obs.Long_, lit(3.0))

  test("bestRowPerGroup: (flag, dt, id) ordering picks best-flag nearest row (A4)") {
    val rounded = obsDf
      .withColumn("time_round", WindowKernels.timeRound(col(Obs.Time), 1L))
      .withColumn("dt", WindowKernels.dtToRound(col(Obs.Time), col("time_round")))
    val best = PivotExport.bestRowPerGroup(rounded, Seq("time_round", Obs.DatastreamId),
      Seq(col(Obs.QcFlag).asc, col("dt").asc, col(Obs.IotId).asc))
    val picked = best.select(col(Obs.IotId)).collect().map(_.getLong(0)).toSet
    // bucket 1000/stream 100: candidates 1 (GOOD, dt .1), 2 (BAD), 3 (GOOD, dt .2) => 1
    assert(picked == Set(1L, 4L, 5L))
  }

  test("alignedExport: wide frame with MISSING fill and coordinates (R2)") {
    val wide = PivotExport.alignedExport(obsDf, Seq(100L, 200L), stepSec = 1L)
    val byTime = wide.collect().map(r => r.getAs[java.sql.Timestamp]("time_round") -> r).toMap
    assert(wide.columns.toSet ==
      Set("time_round", "100_result", "100_qc", "200_result", "200_qc", "lat", "long"))
    assert(wide.count() == 2) // buckets 1000 s and 2000 s
    val t2000 = byTime.find(_._1.getTime == 2000000L).get._2
    // stream 100 absent in bucket 2000 => null result, MISSING flag
    assert(t2000.isNullAt(t2000.fieldIndex("100_result")))
    assert(t2000.getByte(t2000.fieldIndex("100_qc")) == Flags.Missing)
    assert(t2000.getDouble(t2000.fieldIndex("200_result")) == 21.0)
  }

  test("stack/unpivot round-trip (R3, tests/test_qc.py:513-531)") {
    val wide = Seq((1L, 10.0, 20.0)).toDF("t", "a", "b")
    val long = wide.select($"t",
      expr("stack(2, 'a', a, 'b', b) as (stream, result)"))
    assert(long.count() == 2 &&
      long.select(sum($"result")).collect()(0).getDouble(0) == 30.0)
  }
}
