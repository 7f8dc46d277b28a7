package graft.core

import org.apache.spark.sql.SparkSession

/** One place for the session settings every entry point (Verify, Bench,
  * tests) must share so plans and results are identical everywhere.
  */
object Sessions {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS); read as raw ns longs
      // (truncated to µs in Obs.eventsAsObservations)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
