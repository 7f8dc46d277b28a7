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
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // operators cache internal frames; drop between queries
      (name, dt, err)
    }
    // a failed query reports -1 (NOT its wall time: a fast exception path
    // would silently flatter the total) and lands in the "errors" map
    val qs = results.map { case (k, v, e) => s"\"" + k + "\":" + (if (e.isEmpty) v else -1) }
      .mkString("{", ",", "}")
    // full JSON string escaping (AnalysisException messages span lines —
    // a raw \n would break the one-line metric contract)
    def jstr(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + jstr(e) + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
