package graft

import graft.ops.Partitioning
import org.scalatest.matchers.should.Matchers

/** Compaction-plan manifest: split-by-start-offset semantics — an item
  * landing on a boundary belongs to the file its first byte falls in,
  * items never split, every planned file stays ≤ target + one item.
  */
class CompactionPlanSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("split-by-start-offset: boundary item stays whole in its start bin") {
    // group g: sizes 60, 30, 30, 100 at target 100
    //   starts: 0, 60, 90, 120 -> bins 0, 0, 0, 1
    // the 30 starting at 90 CROSSES the boundary but belongs to bin 0
    val df = Seq(("g", 1L, 60L), ("g", 2L, 30L), ("g", 3L, 30L),
      ("g", 4L, 100L)).toDF("source", "doc_id", "n_chars")
    val out = Partitioning.compactionPlan(df, "source", "doc_id", "n_chars",
        targetBytes = 100L)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    out shouldBe Map(
      0L -> ((3L, 120L, 1L, 3L)),  // n_items, bytes (<= target + one item)
      1L -> ((1L, 100L, 4L, 4L)))
  }

  test("groups plan independently and bytes are conserved") {
    val df = Seq(("a", 1L, 50L), ("a", 2L, 50L), ("b", 1L, 10L))
      .toDF("source", "doc_id", "n_chars")
    val out = Partitioning.compactionPlan(df, "source", "doc_id", "n_chars",
      targetBytes = 60L).collect()
    out.map(_.getLong(3)).sum shouldBe 110L
    // a: starts 0, 50 -> bins 0, 0; b: bin 0
    out.map(r => (r.getString(0), r.getLong(1))).toSet shouldBe
      Set(("a", 0L), ("b", 0L))
  }
}
