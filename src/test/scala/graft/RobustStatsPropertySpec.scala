package graft

import graft.functions.Sketches
import graft.ops.WindowKernels
import org.apache.spark.sql.functions._

/** Contract tests on random inputs for the histogram-based robust
  * statistics and the run-length kernels — each checked against a
  * brute-force in-memory reference. Deterministic seed, no flake.
  */
class RobustStatsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  test("exactQuantiles == sorted-list percentile_disc on random multisets") {
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(200)
      // heavy ties on purpose: small value domain
      val vals = Seq.fill(n)((rnd.nextInt(20) - 10).toLong)
      val df = vals.map(("g", _)).toDF("g", "v")
      val ps = Seq(10, 50, 90)
      val got = Sketches.exactQuantiles(df, Seq("g"), $"v", ps).collect()(0)
      val sorted = vals.sorted
      ps.zipWithIndex.foreach { case (q, i) =>
        // percentile_disc: smallest v with cum*100 >= n*q
        val idx = math.ceil(n * q / 100.0).toInt - 1
        val expect = sorted(math.max(idx, 0))
        assert(got.getLong(2 + i) == expect,
          s"trial $trial p$q: got ${got.getLong(2 + i)}, want $expect")
      }
    }
  }

  test("trimmedStats == brute-force trim on random multisets (any sign)") {
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(150)
      val vals = Seq.fill(n)((rnd.nextInt(400) - 200).toLong)
      val df = vals.map(("g", _)).toDF("g", "v")
      val got = Sketches.trimmedStats(df, Seq("g"), $"v", 1L, 10L).collect()(0)
      val k = n / 10
      val mid = vals.sorted.slice(k, n - k)
      assert(got.getLong(1) == n && got.getLong(2) == k)
      assert(got.getLong(3) == mid.sum, s"trial $trial: trimmed sum")
      if (mid.nonEmpty)
        assert(got.getLong(4) == mid.sum / mid.size, // JVM / truncates too
          s"trial $trial: trimmed mean")
    }
  }

  test("madOutliers flags exactly |v - med| > k*MAD of the reference") {
    for (trial <- 1 to 5) {
      val n = 40 + rnd.nextInt(100)
      val vals = Seq.fill(n)(rnd.nextInt(1000).toLong)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
        .toDF("id", "v", "g")
      def disc(s: Seq[Long]): Long = {
        val so = s.sorted; so(math.max(math.ceil(so.size * 0.5).toInt - 1, 0))
      }
      val med = disc(vals)
      val mad = disc(vals.map(v => math.abs(v - med)))
      val expect = vals.zipWithIndex.collect {
        case (v, i) if math.abs(v - med) > 3 * mad => i.toLong
      }.toSet
      val got = Sketches.madOutliers(df, Seq("g"), $"v", k = 3)
        .filter($"is_outlier").select($"id").collect().map(_.getLong(0)).toSet
      assert(got == expect, s"trial $trial")
    }
  }

  test("islands: rows conserved, indices dense, adjacent values differ") {
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(100)
      val rows = (1 to n).map { i =>
        (i.toLong, i.toLong * 10, rnd.nextInt(3).toString, (i % 3).toLong)
      }
      val df = rows.toDF("iot_id", "t_us", "v", "ds")
      val isl = WindowKernels.islands(df, Seq("ds"), col("t_us"),
        col("iot_id"), col("v")).collect()
      assert(isl.map(_.getLong(5)).sum == n, "row conservation")
      isl.groupBy(_.getLong(0)).foreach { case (_, g) =>
        val byIdx = g.sortBy(_.getLong(1))
        assert(byIdx.map(_.getLong(1)).toSeq == (1L to g.length).toSeq,
          "dense 1..k island indices")
        byIdx.sliding(2).foreach {
          case Array(a, b) => assert(a.getString(2) != b.getString(2),
            "adjacent islands share a value")
          case _ =>
        }
      }
    }
  }

  test("ffill: dense grid, observed buckets unfilled, carry never null") {
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(80)
      val rows = (1 to n).map { i =>
        (i.toLong, math.abs(rnd.nextLong() % 5000L), rnd.nextDouble(),
          (i % 4).toLong)
      }
      val df = rows.toDF("iot_id", "t_us", "result", "ds")
      val out = WindowKernels.resampleFfill(df, "ds", "t_us", "result",
        "iot_id", stepUs = 100L).collect()
      val byKey = rows.groupBy(_._4)
      val expectRows = byKey.values.map { g =>
        val bs = g.map(_._2 / 100L)
        bs.max - bs.min + 1
      }.sum
      assert(out.length == expectRows, s"trial $trial: dense grid size")
      assert(out.forall(!_.isNullAt(2)), "carry never null")
      val observed = rows.map(r => (r._4, r._2 / 100L * 100L)).toSet
      val unfilled = out.filterNot(_.getBoolean(3))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(unfilled == observed, "unfilled rows == observed buckets")
    }
  }
}
