package graft

import graft.core.Flags
import graft.ops.Stabilization
import org.apache.spark.sql.functions._

/** W5 — the pinned 5-row stabilization vector (reference
  * `tests/test_qc.py:542-601`, FIXTURES.md §7): 5 hourly rows,
  * result=[1..5], strict bounds (1,6) ⇒ WITHIN_LIMITS=[F,T,T,T,T],
  * max_allowed_downtime=1h, dt_stabilization=2h ⇒
  * flags [BAD,BAD,NQC,NQC,NQC].
  */
class StabilizationSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600.0

  test("pinned 5-row vector: [BAD,BAD,NQC,NQC,NQC]") {
    val df = (0 until 5).map(i => (1L, i * H, (i + 1).toDouble))
      .toDF("datastream_id", "t", "result")
    val out = Stabilization(df, $"result", $"t",
      lit(1.0), lit(6.0), lit(1 * H), lit(2 * H),
      partCols = Seq("datastream_id"), timeCol = "t")
      .orderBy($"t")
    val rows = out.select($"within_limits", $"cum_sec", $"time_up_since_sec",
      $"stab_flag", $"block_id").collect()
    assert(rows.map(_.getBoolean(0)).toSeq == Seq(false, true, true, true, true))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(0.0, H, 2 * H, 3 * H, 4 * H))
    // start-of-data counts as an outage => warm-up until 2 h of uptime
    assert(rows.map(_.getDouble(2)).toSeq == Seq(0.0, H, 2 * H, 3 * H, 4 * H))
    assert(rows.map(_.getByte(3)).toSeq ==
      Seq(Flags.Bad, Flags.Bad, Flags.NoQc, Flags.NoQc, Flags.NoQc))
    assert(rows.map(_.getLong(4)).toSeq == Seq(1L, 2L, 2L, 2L, 2L))
  }

  test("long mid-series outage restarts the stabilization clock") {
    // in-limits rows, a 3 h gap below limits, then back up
    val data = Seq(
      (0.0, 5.0), (1 * H, 5.0), (2 * H, 5.0),     // up
      (3 * H, 0.0), (4 * H, 0.0), (5 * H, 0.0),   // down: time_down grows to 3h > 1h
      (6 * H, 5.0), (7 * H, 5.0), (8 * H, 5.0), (9 * H, 5.0)) // back up
    val df = data.map { case (t, r) => (1L, t, r) }.toDF("datastream_id", "t", "result")
    val out = Stabilization(df, $"result", $"t",
      lit(1.0), lit(6.0), lit(1 * H), lit(2 * H),
      partCols = Seq("datastream_id"), timeCol = "t").orderBy($"t")
    val flags = out.select($"stab_flag").collect().map(_.getByte(0)).toSeq
    // rows 0-1: initial warm-up (BAD until 2 h up since start)
    // rows 4-5: time_down reaches 2 h / 3 h > max => outage markers => BAD
    // row 6: back up but only 1 h since the last marker => BAD
    // rows 2-3 (stabilized), row 3 still within its up-run, 7-9 stabilized
    assert(flags == Seq(Flags.Bad, Flags.Bad, Flags.NoQc, Flags.NoQc,
      Flags.Bad, Flags.Bad, Flags.Bad, Flags.NoQc, Flags.NoQc, Flags.NoQc))
  }

  test("per-stream independence: each stream gets its own state machine") {
    val df = (for (ds <- 1L to 3L; i <- 0 until 5)
      yield (ds, i * H, (i + 1).toDouble)).toDF("datastream_id", "t", "result")
    val out = Stabilization(df, $"result", $"t",
      lit(1.0), lit(6.0), lit(1 * H), lit(2 * H),
      partCols = Seq("datastream_id"), timeCol = "t")
    val perStream = out.groupBy($"datastream_id")
      .agg(sum(when($"stab_flag" === Flags.Bad, 1).otherwise(0)).as("n_bad"))
      .collect().map(r => r.getLong(1))
    assert(perStream.toSeq == Seq(2L, 2L, 2L))
  }
}
