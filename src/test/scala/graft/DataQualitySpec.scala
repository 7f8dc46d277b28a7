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
}
