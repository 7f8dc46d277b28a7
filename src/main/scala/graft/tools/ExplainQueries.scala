package graft.tools

/** Dump the formatted physical plan of named declared queries —
  * the plan-audit tool (`sbt 'runMain graft.tools.ExplainQueries
  * <sfDir> <q1,q2,...>'`).
  */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.Sessions.local()
    try names.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    } finally spark.stop()
  }
}
