package graft

import graft.core.Sessions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, lazy). Every
  * streaming suite runs under the PRODUCTION state store provider
  * (RocksDB, spillable, changelog-checkpointed) — the default in-memory
  * HDFS-backed store would leave the at-scale state lifecycle untested.
  */
object TestSession {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("local[4]", 4).getOrCreate()
    Sessions.useRocksDbStateStore(s)
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
