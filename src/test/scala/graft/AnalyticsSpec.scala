package graft

/** Product-analytics invariants for the cohort/association queries;
  * exact replay is pinned by the DuckDB oracles.
  */
class AnalyticsSpec extends SparkSpec {

  test("cohort retention: offset-0 retention is exactly 1.0; offsets non-negative") {
    val rows = SparkEntry.queries("a9_cohort_retention")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0))
    rows.filter(_._2 == 0L).foreach { case (cw, _, _, ret) =>
      assert(ret == 1000000L, s"cohort $cw offset 0 must retain 100%")
    }
    // active never exceeds the cohort size => retention <= 1.0
    assert(rows.forall(_._4 <= 1000000L))
  }

  test("association rules: support floor respected, lift symmetric in counts") {
    val rows = SparkEntry.queries("q_assoc_rules")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= 3L, "support floor")
      assert(r.getLong(0) < r.getLong(1), "canonical pair order")
      assert(r.getLong(3) <= 1000000L && r.getLong(4) <= 1000000L,
        "confidence is a ratio")
    }
    // sorted by lift desc
    val lifts = rows.map(_.getLong(5))
    assert(lifts.sameElements(lifts.sortBy(-_)))
  }
}
