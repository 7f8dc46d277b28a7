package graft

import graft.ops.DataQuality._
import org.apache.spark.sql.functions._

/** Rule-helper semantics on a toy frame with planted violations; the
  * q_quality_audit oracle pins the integer replay.
  */
class DataQualitySpec extends SparkSpec {

  test("audit evaluates all rules in one pass with planted violations") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, 1, Some(5.0)), (1L, 2, Some(60.0)), // 60 out of bounds
      (2L, 1, None),                           // null -> incomplete + violation
      (2L, 1, Some(7.0))                       // dup key (2,1)
    ).toDF("k", "ln", "v")
    val rules = Seq(
      ("complete", completenessMicro(col("v")),
        completenessMicro(col("v")) === 1000000L),
      ("bounds", boundViolations(col("v"), lit(0.0), lit(50.0)),
        boundViolations(col("v"), lit(0.0), lit(50.0)) === 0L),
      ("unique", dupCount(col("k"), col("ln")),
        dupCount(col("k"), col("ln")) === 0L))
    val got = audit(df, rules).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("complete") == (750000L, false)) // 3 of 4 non-null
    assert(got("bounds") == (2L, false))        // the 60 and the null
    assert(got("unique") == (1L, false))        // one dup pair
    // a clean frame passes everything
    val clean = Seq((1L, 1, Some(5.0)), (2L, 1, Some(6.0))).toDF("k", "ln", "v")
    assert(audit(clean, rules).collect().forall(_.getBoolean(2)))
  }

  test("refIntegrity counts orphans incl. null keys; zero orphans passes") {
    val s = spark; import s.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = refIntegrity("ref", child, col("fk"), parent, col("pk")).collect()(0)
    assert(r.getLong(1) == 2L && !r.getBoolean(2)) // 9 and null
    val ok = refIntegrity("ref", Seq(1L, 3L).toDF("fk"), col("fk"),
      parent, col("pk")).collect()(0)
    assert(ok.getLong(1) == 0L && ok.getBoolean(2))
  }

  test("snapshotDiff: statuses, multi-column change lists, null transitions") {
    val s = spark; import s.implicits._
    val old = Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), Some(2.0)),
      (3L, Some("c"), Some(3.0)), (4L, None: Option[String], Some(4.0)))
      .toDF("k", "c1", "c2")
    val nw = Seq((1L, Some("a"), Some(1.0)),        // unchanged
      (2L, Some("B"), Some(2.5)),                   // both cols changed
      (4L, Some("x"), Some(4.0)),                   // null -> value change
      (5L, Some("new"), Some(5.0)))                 // added; 3 removed
      .toDF("k", "c1", "c2")
    val got = graft.core.Tables.snapshotDiff(old, nw, "k", Seq("c1", "c2"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)))).toMap
    assert(got(1L) == ("unchanged", None))
    assert(got(2L) == ("changed", Some("c1,c2")))
    assert(got(3L) == ("removed", None))
    assert(got(4L) == ("changed", Some("c1")))
    assert(got(5L) == ("added", None))
  }

  test("q_quality_audit: the planted rules fail, the structural rules pass") {
    val got = SparkEntry.queries("q_quality_audit")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(got("quantity_completeness") && got("quantity_bounds")
      && got("orderkey_ref"))
    // discount/shipdate bounds are deliberately tighter than the data;
    // pk_unique fails because the synthetic lineitem genuinely carries
    // duplicate (orderkey, linenumber) pairs — the audit's job is to
    // report them, which it does
    assert(!got("discount_bounds") && !got("shipdate_range") && !got("pk_unique"),
      s"the failing rules must report: $got")
  }

  // reference chi-square replaying the exact integer evaluation order
  private def chi2Ref(a: Long, b: Long, c: Long, d: Long): Long = {
    val M = BigInt(1000000)
    val nn = BigInt(a + b + c + d)
    def e(rm: Long, cm: Long) = BigInt(rm) * cm * M / nn
    val (ea, eb, ec, ed) =
      (e(a + b, a + c), e(a + b, b + d), e(c + d, a + c), e(c + d, b + d))
    def cell(o: Long, ev: BigInt) = (BigInt(o) * M - ev).pow(2) / ev
    (cell(a, ea) + cell(b, eb) + cell(c, ec) + cell(d, ed)).toLong
  }

  test("chiSquareAB: hand-built 2x2 tables match the integer reference") {
    val s = spark; import s.implicits._
    // X skews true, Z mirrors it, Y is balanced — so Y-vs-rest is an
    // exactly independent table (with only two categories, X-vs-rest
    // and Y-vs-rest would be the SAME table and the comparison vacuous)
    val rows =
      Seq.fill(40)((true, "X")) ++ Seq.fill(10)((false, "X")) ++
        Seq.fill(25)((true, "Y")) ++ Seq.fill(25)((false, "Y")) ++
        Seq.fill(10)((true, "Z")) ++ Seq.fill(40)((false, "Z"))
    val got = graft.ops.DataQuality.chiSquareAB(
        rows.toDF("grp", "cat"), col("grp"), col("cat"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // group0 = grp==false, so a = group-false hits of X = 10
    assertResult((10L, 40L, 65L, 35L, chi2Ref(10, 40, 65, 35)))(got("X"))
    assertResult((25L, 25L, 50L, 50L, chi2Ref(25, 25, 50, 50)))(got("Y"))
    // dependence must show: X far above the independent Y (exactly 0)
    assert(got("X")._5 > 10000000L, s"X chi2: ${got("X")._5}")
    assertResult(0L)(got("Y")._5)
  }

  test("chiSquareAB: category missing one variant entirely") {
    val s = spark; import s.implicits._
    val rows = Seq.fill(30)((false, "only0")) ++
      Seq.fill(10)((true, "both")) ++ Seq.fill(10)((false, "both"))
    val got = graft.ops.DataQuality.chiSquareAB(
        rows.toDF("grp", "cat"), col("grp"), col("cat"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // g=1 when grp true: only0 has a=30 (g0), b=0; totals t0=40, t1=10
    assertResult((30L, 0L, 10L, 10L))(got("only0"))
    assertResult((10L, 10L, 30L, 0L))(got("both"))
  }

  test("benfordAudit: digit extraction, exclusions, Q16 expectation") {
    val s = spark; import s.implicits._
    import graft.functions.Portable.log2q16Ref
    // v: digits 9, 1, 1, 3; zero and negative excluded
    val rows = Seq(999999L, 1000000L, 123L, 3L, 0L, -5L)
    val got = graft.ops.DataQuality.benfordAudit(
        rows.toDF("v"), col("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assertResult(Set(9L, 1L, 3L))(got.keySet)
    assertResult(2L)(got(1L)._1)
    assertResult(500000L)(got(1L)._2) // 2 of 4
    def exp(d: Long) =
      (log2q16Ref(d + 1) - log2q16Ref(d)) * 1000000L / log2q16Ref(10L)
    assertResult(exp(1))(got(1L)._3)
    assertResult(exp(9))(got(9L)._3)
    assertResult(250000L - exp(3))(got(3L)._4)
    // the nine expectations are a near-partition of unity (Q16 floor
    // truncation loses at most a few ppm per digit)
    val tot = (1L to 9L).map(exp).sum
    assert(tot > 999900L && tot <= 1000000L, s"Benford ppm total: $tot")
  }
}
