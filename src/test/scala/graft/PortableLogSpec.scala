package graft

import graft.functions.Portable
import org.apache.spark.sql.functions._
/** Pins the portable Q16 log2: the Column fold == the Long-loop
  * reference on exhaustive small values, structured edge values and
  * random 63-bit values; the reference tracks true log2 within the
  * algorithm's error budget and is monotone (so threshold decisions and
  * rankings built on it are order-correct). The SQL rendering is pinned
  * by the driver's DuckDB gate through t_bm25_topk / t_lm_score.
  */
class PortableLogSpec extends SparkSpec {

  private def edges: Seq[Long] = {
    val pows = (0 to 62).map(1L << _)
    (pows ++ pows.map(_ - 1) ++ pows.map(_ + 1))
      .filter(x => x >= 1 && x <= Long.MaxValue - 1) :+ Long.MaxValue
  }

  test("Column fold equals the Long-loop reference (exhaustive + edges + random)") {
    val rnd = new scala.util.Random(42)
    val rand = Seq.fill(2000)(math.abs(rnd.nextLong()) max 1L)
    val xs = ((1L to 4096L) ++ edges ++ rand).distinct
    val spark0 = spark
    import spark0.implicits._
    val got = xs.toDF("x")
      .select(col("x"), Portable.log2q16(col("x")).as("lg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      assert(got(x) == Portable.log2q16Ref(x), s"x=$x")
    }
  }

  test("reference tracks true log2 within 2^-16 + mantissa truncation") {
    val xs = (1L to 4096L) ++ edges
    xs.foreach { x =>
      val approx = Portable.log2q16Ref(x) / 65536.0
      val truth = math.log(x.toDouble) / math.log(2.0)
      // floor-truncating algorithm: always <= truth (+tiny fp slack),
      // and within one fraction ulp + normalization truncation
      assert(approx <= truth + 1e-9, s"x=$x approx=$approx truth=$truth")
      assert(truth - approx <= 1.0 / 65536.0 + 1e-8, s"x=$x approx=$approx truth=$truth")
    }
  }

  test("reference is monotone non-decreasing") {
    var prev = Long.MinValue
    (1L to 200000L).foreach { x =>
      val v = Portable.log2q16Ref(x)
      assert(v >= prev, s"x=$x")
      prev = v
    }
    // and across magnitudes
    edges.sorted.foldLeft(Long.MinValue) { (p, x) =>
      val v = Portable.log2q16Ref(x)
      assert(v >= p, s"x=$x"); v
    }
    ()
  }

  test("exact powers of two have zero fraction") {
    (0 to 62).foreach { k =>
      assert(Portable.log2q16Ref(1L << k) == k.toLong << 16, s"k=$k")
    }
  }
}
