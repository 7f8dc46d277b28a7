package graft

import graft.core.Obs
import graft.ops.{Partitioning, WindowKernels}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale utilities: salted aggregation equivalence and overlap-chunked
  * window parallelism (results must be identical to the unchunked run).
  */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum/count equals plain groupBy") {
    val df = (1 to 10000).map(i => (i % 3L, i.toDouble)).toDF("k", "v").repartition(8)
    val plain = df.groupBy($"k").agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Partitioning.saltedSumCount(df, Seq("k"), "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("chunked+overlap gradient equals single-partition gradient") {
    // one hot stream, 500 rows, 10 s cadence
    val df = (0 until 500).map(i => (i.toLong, i * 10000000L, math.sin(i / 10.0) * 50))
      .toDF("id", "t_us", "v")
    val wFull = Window.partitionBy(lit(1)).orderBy($"t_us")
    val expected = df
      .withColumn("g", WindowKernels.gradient($"v", $"t_us".cast("double") / 1e6, wFull))
      .select($"id", $"g").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // chunk into 60 s pieces with 20 s overlap: gradient needs 1 neighbor
    // row of context on each side; 20 s covers 2 cadence steps
    val chunked = Partitioning.chunkWithOverlap(df, $"t_us", 60000000L, 20000000L)
    val wChunk = Window.partitionBy($"__chunk").orderBy($"t_us")
    val got = chunked
      .withColumn("g", WindowKernels.gradient($"v", $"t_us".cast("double") / 1e6, wChunk))
      .filter(!$"is_context") // context rows exist only to feed lag/lead
      .select($"id", $"g").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(got.size == 500)
    // interior rows must agree exactly; the global first/last rows keep
    // their one-sided edge forms
    expected.foreach { case (id, e) =>
      assert(math.abs(got(id) - e) < 1e-12, s"row $id: $e vs ${got(id)}")
    }
  }
}
