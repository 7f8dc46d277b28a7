package graft.tools

import graft.core.Obs
import graft.pipeline.QcMain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage attribution for the QC lifecycle's "ranges" phase (round-14
  * verdict #5: 127 s of the 159 s sf10 century row). `QcMain.runFrom`
  * materializes the whole lazy chain at the value-pass count, so the
  * recorded ranges_sec is really stab+geo+kinematics+value; this tool
  * times each CUMULATIVE prefix of the same stage functions from the
  * same cached obs frame (noop sink), so successive differences
  * attribute wall-time to the stage that added it.
  *
  * `SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.QcProfile /tmp/graft_sf10b'`
  */
object QcProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    val obsIn = Obs.eventsAsObservations(spark, sfDir)
    val cfg = graft.QcLifecycle.configFor(obsIn)

    val obs = obsIn.withColumn("t_us", unix_micros(col(Obs.Time))).cache()
    val n = obs.count()

    def timedNoop(name: String, df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"QCPROFILE $name%-12s cum=$dt%8.2f s")
      dt
    }

    val stab = QcMain.stabPass(spark, obs, cfg)
    val geo = QcMain.geoPass(stab, cfg)
    val kin = QcMain.kinPass(geo, cfg)
    val value = QcMain.valuePass(spark, kin, cfg)

    val tStab = timedNoop("stab", stab)
    val tGeo = timedNoop("stab+geo", geo)
    val tKin = timedNoop("...+kin", kin)
    val tVal = timedNoop("...+value", value)
    println(f"QCPROFILE rows=$n geo=${tGeo - tStab}%.2f kin=${tKin - tGeo}%.2f value=${tVal - tKin}%.2f (stab=$tStab%.2f)")
    spark.stop()
  }
}
