package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Portable HLL — accuracy against exact distinct (expected relative
  * error ≈ 1.04/√4096 ≈ 1.6% for p=12) and invariance under
  * partitioning (the estimate is a pure function of the value SET).
  */
class SketchesSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("hllProfile: estimate within 5% of exact distinct; zeros+denom consistent") {
    val n = 20000
    val df = (1 to n).map(i => ("g", s"item_$i")).toDF("g", "v")
      .union((1 to 500).map(i => ("h", s"thing_${i % 100}")).toDF("g", "v"))
    val out = Sketches.hllProfile(df, Seq("g"), $"v").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("hll_zeros"), r.getAs[Long]("hll_denom_q49"),
          r.getAs[Double]("hll_estimate"))).toMap
    val (_, _, estG) = out("g")
    estG shouldBe n.toDouble +- n * 0.05
    val (zerosH, _, _) = out("h")
    // 100 distincts over 4096 registers: nearly all registers empty, and
    // the raw estimate saturates near alpha*m — the caller applies
    // linear counting m*ln(m/zeros) below 2.5m, which hll_zeros carries
    zerosH should be >= 3900L
    val lc = 4096.0 * math.log(4096.0 / zerosH)
    lc shouldBe 100.0 +- 5.0
  }

  test("cms: estimates upper-bound true counts; exact when vocab << cells") {
    // 50 tokens, zipf-ish counts; 8192 cells per row → collisions are
    // possible but the min-over-4-rows estimate must never undercount
    val rows = (1 to 50).flatMap(i => Seq.fill(i * 3)(s"tok_$i"))
    val df = rows.map(Tuple1(_)).toDF("t")
    val sketch = Sketches.cmsSketch(df, $"t")
    val est = Sketches.cmsEstimate(sketch, df, $"t").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 50).foreach { i =>
      est(s"tok_$i") should be >= (i * 3).toLong
    }
    // 50 distinct over 4×2048 cells: overwhelmingly collision-free, so
    // at least 45 of the 50 estimates are exact
    val exact = (1 to 50).count(i => est(s"tok_$i") == (i * 3).toLong)
    exact should be >= 45
  }

  test("hllProfile: identical output under any input partitioning") {
    val df = (1 to 5000).map(i => ("g", s"x${i % 1234}")).toDF("g", "v")
    val a = Sketches.hllProfile(df, Seq("g"), $"v").collect().head
    val b = Sketches.hllProfile(df.repartition(17), Seq("g"), $"v").collect().head
    a.getAs[Long]("hll_denom_q49") shouldBe b.getAs[Long]("hll_denom_q49")
    a.getAs[Double]("hll_estimate") shouldBe b.getAs[Double]("hll_estimate")
  }
}
