package graft

import graft.core.Flags
import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

/** J2/J3 — as-of join semantics, pinned by the reference's dependent-
  * quantity matrices (`tests/test_qc.py:604-971`, `README.adoc:257-268`):
  * nearest |Δt| within tolerance; unmatched dependents get
  * flag_when_missing (default BAD, None = leave); secondary value check
  * flags the dependent when the independent *value* is out of range.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 1000000L), // matches right at 1000100 (dt 100)
    (2L, 5000000L), // nearest right at 5000400 (dt 400) vs 4999500 (dt 500)
    (3L, 9000000L)  // no right within tolerance
  ).toDF("lid", "t_us")

  private def right = Seq(
    (11L, 1000100L, 10.0),
    (12L, 4999500L, 20.0),
    (13L, 5000400L, 30.0),
    (14L, 20000000L, 40.0)
  ).toDF("rid", "t_us", "rv")

  test("nearest-in-tolerance match with deterministic tiebreak (test_qc.py:604-624)") {
    val m = AsofJoin.nearest(left, right, keys = Seq.empty,
      leftTimeUs = "t_us", rightTimeUs = "t_us", toleranceUs = 1000L,
      rightCols = Seq("rid", "t_us", "rv"), rightIdCol = Some("rid"))
      .orderBy($"lid")
    val rows = m.select($"lid", $"r_rid", $"asof_matched").collect()
    assert(rows.map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
      r.getBoolean(2))).toSeq ==
      Seq((1L, 11L, true), (2L, 13L, true), (3L, -1L, false)))
  }

  test("1-day-shift scenario: nothing matches => all unmatched (test_qc.py:683-702)") {
    val shifted = right.withColumn("t_us", $"t_us" + 86400000000L)
    val m = AsofJoin.nearest(left, shifted, Seq.empty, "t_us", "t_us", 500000L,
      rightCols = Seq("rid"), rightIdCol = Some("rid"))
    assert(m.filter($"asof_matched").count() == 0)
  }

  test("flag propagation matrix: copy-if-bad, keep-if-good, missing=BAD (732-779)") {
    val m = AsofJoin.nearest(left, right, Seq.empty, "t_us", "t_us", 1000L,
      rightCols = Seq("rid", "rv"), rightIdCol = Some("rid"))
      .withColumn("indep_flag",
        when($"r_rid" === 11L, lit(Flags.ProbablyBad))
          .otherwise(lit(Flags.Good)).cast("tinyint"))
    val out = m.withColumn("flag",
        AsofJoin.propagateFlag(lit(Flags.NoQc).cast("tinyint"), $"indep_flag"))
      .orderBy($"lid").select($"lid", $"flag").collect()
      .map(r => (r.getLong(0), r.getByte(1))).toSeq
    // lid 1: matched rid 11 (PROBABLY_BAD) => copied
    // lid 2: matched rid 13 (GOOD) => not copied, stays NQC
    // lid 3: unmatched => BAD
    assert(out == Seq((1L, Flags.ProbablyBad), (2L, Flags.NoQc), (3L, Flags.Bad)))
  }

  test("flag_when_missing=None leaves unmatched dependents untouched (838-879)") {
    val m = AsofJoin.nearest(left, right, Seq.empty, "t_us", "t_us", 1000L,
      rightCols = Seq("rid"), rightIdCol = Some("rid"))
      .withColumn("indep_flag", lit(Flags.Good).cast("tinyint"))
    val out = m.withColumn("flag",
        AsofJoin.propagateFlag(lit(Flags.NoQc).cast("tinyint"), $"indep_flag",
          flagWhenMissing = None))
      .orderBy($"lid").select($"flag").collect().map(_.getByte(0)).toSeq
    assert(out == Seq(Flags.NoQc, Flags.NoQc, Flags.NoQc))
  }

  test("secondary value check: independent value out of range => dependent BAD (882-971)") {
    val m = AsofJoin.nearest(left, right, Seq.empty, "t_us", "t_us", 1000L,
      rightCols = Seq("rid", "rv"), rightIdCol = Some("rid"))
    val out = m.withColumn("flag",
        AsofJoin.secondaryValueCheck(lit(Flags.NoQc).cast("tinyint"), $"r_rv", 15.0, 100.0))
      .orderBy($"lid").select($"lid", $"flag").collect()
      .map(r => (r.getLong(0), r.getByte(1))).toSeq
    // lid 1: rv=10 < 15 => BAD; lid 2: rv=30 in range => untouched;
    // lid 3: unmatched => untouched (secondary only fires on matches)
    assert(out == Seq((1L, Flags.Bad), (2L, Flags.NoQc), (3L, Flags.NoQc)))
  }

  test("duplicate left rows each keep their own match") {
    val dupLeft = Seq((1L, 1000000L), (1L, 1000000L)).toDF("lid", "t_us")
    val m = AsofJoin.nearest(dupLeft, right, Seq.empty, "t_us", "t_us", 1000L,
      rightCols = Seq("rid"), rightIdCol = Some("rid"))
    assert(m.count() == 2 && m.filter($"asof_matched").count() == 2)
  }
}
