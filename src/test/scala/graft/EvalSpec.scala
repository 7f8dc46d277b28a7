package graft

import graft.functions.Eval
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class EvalSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Boolean)], buckets: Int = 4) = {
    val r = Eval.rocAuc(rows.toDF("s", "y"), col("s"), col("y"), buckets)
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3))
  }

  test("perfect separation = 1e6; reversed = 0; all-tied = 500000") {
    auc(Seq((1L, false), (2L, false), (10L, true), (11L, true))) shouldBe
      ((2L, 2L, 8L, 1000000L))
    auc(Seq((10L, false), (11L, false), (1L, true), (2L, true))) shouldBe
      ((2L, 2L, 0L, 0L))
    auc(Seq((5L, true), (5L, false), (5L, true), (5L, false))) shouldBe
      ((2L, 2L, 4L, 500000L))
  }

  test("mixed case matches the hand count, ties at half weight") {
    // scores: neg {1, 3, 3}, pos {2, 3, 7}
    //   pos 2: beats neg1            -> 2
    //   pos 3: beats neg1, ties 3,3  -> 2 + 1 + 1 = 4
    //   pos 7: beats all three       -> 6
    // U2 = 12 of max 18 -> AUC = 12/18 = 666666 ppm (floor)
    auc(Seq((1L, false), (3L, false), (3L, false),
      (2L, true), (3L, true), (7L, true))) shouldBe
      ((3L, 3L, 12L, 666666L))
  }

  test("degenerate single-class input yields null AUC, honest counts") {
    auc(Seq((1L, true), (2L, true))) shouldBe ((2L, 0L, 0L, -1L))
  }

  test("bucketing is invisible: 1, 4 and 64 buckets agree on skewed scores") {
    val rows = (1 to 500).map(i =>
      ((i * i).toLong % 997, i % 3 == 0)) // clustered score distribution
    val expect = auc(rows, 1)
    auc(rows, 4) shouldBe expect
    auc(rows, 64) shouldBe expect
  }
}
