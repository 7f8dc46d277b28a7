package graft

import graft.functions.SkewCap
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The skew-safe two-phase cap (groupBy partial-agg → broadcast anti-join)
  * must be a drop-in replacement for the count-over-window cap it
  * replaced: identical surviving rows for every cap, including null-key
  * groups, plus the plan property that makes it scale — the hot key is
  * filtered by a broadcast anti-join, not colocated by a window.
  */
class SkewCapSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "hot"), (2L, "hot"), (3L, "hot"), (4L, "hot"),
    (5L, "warm"), (6L, "warm"), (7L, "rare"),
    (8L, null.asInstanceOf[String]), (9L, null.asInstanceOf[String])
  ).toDF("id", "k")

  test("dropOverCap ≡ the count-over-window cap filter, at every cap, null keys included") {
    val df = fixture
    for (cap <- Seq(1L, 2L, 3L, 50L, Long.MaxValue)) {
      val twoPhase = SkewCap.dropOverCap(df, col("k"), cap)
        .select("id").as[Long].collect().sorted.toSeq
      val windowed = df
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("k"))))
        .filter(col("__n") <= cap)
        .select("id").as[Long].collect().sorted.toSeq
      assert(twoPhase == windowed, s"cap=$cap: $twoPhase vs window form $windowed")
    }
  }

  test("overCapKeys returns exactly the pathological keys") {
    val over = SkewCap.overCapKeys(fixture, col("k"), 2L)
      .as[String].collect().toSet
    assert(over == Set("hot"))
  }

  test("cap plan: broadcast anti-join, no window, partial aggregation on the count side") {
    val p = SkewCap.dropOverCap(fixture, col("k"), 2L)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"cap must be an anti-join:\n$p")
    assert(p.contains("BroadcastExchange"), s"over-cap key set must broadcast:\n$p")
    assert(!p.contains("Window"), s"no window may remain in the cap path:\n$p")
    // the count side must partially aggregate (map-side combine absorbs
    // the hot key before its rows ever shuffle)
    assert(p.contains("partial_count"),
      s"partial-agg count phase missing:\n$p")
  }

  test("broadcast=false conf: cap falls back to a shuffled anti-join, same rows") {
    // the escape hatch for a small cap over a heavy-tailed vocabulary,
    // where the over-cap key set (bounded only by |df|/cap) would OOM
    // the driver as a broadcast
    spark.conf.set(SkewCap.BroadcastConf, "false")
    try {
      val got = SkewCap.dropOverCap(fixture, col("k"), 2L)
      val p = got.queryExecution.executedPlan.toString
      assert(p.contains("LeftAnti"), s"cap must still be an anti-join:\n$p")
      assert(!p.contains("BroadcastExchange"),
        s"fallback mode must not broadcast the over-cap keys:\n$p")
      assert(got.select("id").as[Long].collect().sorted.toSeq ==
        Seq(5L, 6L, 7L, 8L, 9L))
    } finally spark.conf.unset(SkewCap.BroadcastConf)
  }
}
