package graft

import graft.ops.{AsofJoin, WindowKernels}
import org.apache.spark.sql.functions._

/** Property tests planned in SURVEY §5: the as-of join's contract on
  * random inputs (every match is in-tolerance AND minimal; every
  * unmatched row truly has no partner), and half-even time rounding's
  * invariants. Deterministic seeds — reproducible, no flake.
  */
class AsofPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("asof nearest: matched => minimal |dt| within tolerance; unmatched => none exists") {
    for (trial <- 1 to 5) {
      val tol = 1000L + rnd.nextInt(5000)
      val leftTimes = Seq.fill(60)(rnd.nextLong() % 1000000L).map(math.abs).distinct
      val rightTimes = Seq.fill(40)(rnd.nextLong() % 1000000L).map(math.abs).distinct
      val left = leftTimes.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("lid", "t_us")
      val right = rightTimes.zipWithIndex.map { case (t, i) => (i.toLong + 1000, t) }
        .toDF("rid", "t_us")
      val m = AsofJoin.nearest(left, right, Seq.empty, "t_us", "t_us", tol,
          rightCols = Seq("rid", "t_us"), rightIdCol = Some("rid"))
        .select($"lid", $"t_us", $"r_t_us", $"asof_matched").collect()

      assert(m.length == leftTimes.length, s"trial $trial: row preservation")
      m.foreach { r =>
        val lt = r.getLong(1)
        val bestPossible = rightTimes.map(rt => math.abs(lt - rt)).minOption
        if (r.getBoolean(3)) {
          val dt = math.abs(lt - r.getLong(2))
          assert(dt <= tol, s"trial $trial: matched outside tolerance")
          assert(dt == bestPossible.get, s"trial $trial: not the nearest partner")
        } else {
          assert(bestPossible.forall(_ > tol),
            s"trial $trial: unmatched but a partner existed within $tol")
        }
      }
    }
  }

  test("timeRound: result is the nearest second; exact ties go to the even bucket") {
    val times = (Seq.fill(200)(math.abs(rnd.nextLong()) % 100000000000L) ++
      Seq(1500000L, 2500000L, 3500000L, 4500000L)) // exact .5 ties
    val df = times.zipWithIndex.map { case (us, i) => (i.toLong, us) }.toDF("id", "us")
      .withColumn("ts", timestamp_micros($"us"))
      .withColumn("r_us", unix_micros(WindowKernels.timeRound($"ts", 1L)))
    df.select($"us", $"r_us").collect().foreach { row =>
      val (us, r) = (row.getLong(0), row.getLong(1))
      val dt = math.abs(us - r)
      assert(r % 1000000L == 0, "rounded to a whole second")
      assert(dt <= 500000L, s"$us rounded to $r: off by more than half a second")
      if (us % 1000000L == 500000L)
        assert((r / 1000000L) % 2 == 0, s"tie at $us must land on an even second, got $r")
    }
  }
}
