package graft

import graft.ops.{Graphs, WindowKernels}
import org.scalatest.matchers.should.Matchers

/** Hand-computed fixtures for the round's two report kernels: k-hop BFS
  * reachability and the hour-of-day seasonal-strength decomposition.
  */
class SeasonalReachSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) = {
    val e = pairs.toDF("src", "dst")
    e.union(e.select($"dst".as("src"), $"src".as("dst")))
  }

  test("reachHops: first-reached hop along a path, NULL past the horizon") {
    // 20-1-2-3-4 path, seed = 20 only; 3 hops reach up to vertex 3
    val out = Graphs.reachHops(sym(20L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L),
        seedMod = 20L, hops = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    out shouldBe Map(20L -> Some(0), 1L -> Some(1), 2L -> Some(2),
      3L -> Some(3), 4L -> None)
  }

  test("reachHops: two seeds meet in the middle; first hop wins") {
    // 20-1-2-40: both ends seed; vertex 1 and 2 are both hop 1
    val out = Graphs.reachHops(sym(20L -> 1L, 1L -> 2L, 2L -> 40L),
        seedMod = 20L, hops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out shouldBe Map(20L -> 0, 40L -> 0, 1L -> 1, 2L -> 1)
  }

  test("seasonal strength: pure hod signal = 1e6, constant = NULL, " +
    "hod-independent alternation = 0") {
    val H = 3600000000L
    val D = 24L * H
    // stream 0: v = (hod % 4) * 1e6 over 4 days — residuals exactly 0
    val pure = for (d <- 0L until 4L; hod <- 0L until 24L)
      yield (0L, d * D + hod * H, (hod % 4) * 1000000L, d * 100 + hod)
    // stream 1: constant — zero variance, NULL strength
    val const = for (d <- 0L until 2L; hod <- 0L until 4L)
      yield (1L, d * D + hod * H, 5000000L, d * 100 + hod)
    // stream 2: same hods get +1e6 on even days, -1e6 on odd — per-hod
    // means are 0, level 0, so residual == deviation and strength == 0
    val alt = for (d <- 0L until 4L; hod <- 0L until 6L)
      yield (2L, d * D + hod * H, (if (d % 2 == 0) 1L else -1L) * 1000000L,
        d * 100 + hod)
    val df = (pure ++ const ++ alt)
      .toDF("datastream_id", "t_us", "v_micro", "iot_id")
    val out = WindowKernels.seasonalStrength(df, "datastream_id", "t_us",
        "v_micro")
      .collect().map(r => r.getLong(0) -> r).toMap
    val s0 = out(0L)
    s0.getLong(3) shouldBe 1000000L           // strength_ppm
    s0.getLong(4) shouldBe 3L                 // peak hod: ties -> smallest
    s0.getLong(5) shouldBe 1500000L           // 3e6 - level(1.5e6)
    assert(out(1L).isNullAt(3))               // constant stream: NULL
    out(2L).getLong(3) shouldBe 0L            // no seasonal structure
  }
}
