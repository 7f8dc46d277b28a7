package graft.tools

import java.nio.file.{Files, Paths}

/** Debug tool: dump generated oracle-SQL fragments (or a full declared
  * oracle) to a file so the DuckDB side can be exercised standalone
  * while iterating — `runMain graft.tools.DumpSql <what> <outFile>`.
  * `what` is either a query name from SparkEntry.oracleSql or one of
  * the named fragments below.
  */
object DumpSql {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val out = args(1)
    val text = what match {
      case "log2q16" =>
        graft.functions.Portable.log2q16Sql("v", Seq("x"), "x", "lg", "lg")
      case name =>
        graft.SparkEntry.oracleSql.getOrElse(name,
          sys.error(s"unknown query/fragment: $name"))
    }
    Files.writeString(Paths.get(out), text)
    println(s"wrote ${text.length} chars to $out")
  }
}
