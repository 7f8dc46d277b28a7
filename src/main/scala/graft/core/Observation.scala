package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed view of the canonical observation row (SURVEY §1.5: a
  * `Dataset[Observation]` where compile-time field checks help; the
  * untyped DataFrame remains the norm for dynamic-schema paths).
  * Field names match [[Obs]] (with `long`/`lat` renamed to
  * `longitude`/`latitude` — `long` is a Java keyword the encoder rejects)
  * so `.as[Observation]` binds by name.
  */
final case class Observation(
    iot_id: Long,
    result: Double,
    phenomenonTime: java.sql.Timestamp,
    qc_rank: Byte,
    datastream_id: Long,
    observation_type: String,
    units: String,
    longitude: Double,
    latitude: Double,
    feature_id: Long)

object Observation {

  /** Bind a frame carrying the canonical columns to the typed view. */
  def datasetOf(df: DataFrame): Dataset[Observation] = {
    import df.sparkSession.implicits._
    df.select(
      col(Obs.IotId), col(Obs.Result), col(Obs.Time), col(Obs.QcFlag),
      col(Obs.DatastreamId), col(Obs.ObservationType), col(Obs.Units),
      col(Obs.Long_).as("longitude"), col(Obs.Lat).as("latitude"), col(Obs.FeatureId)
    ).as[Observation]
  }

  def events(spark: SparkSession, sfDir: String): Dataset[Observation] =
    datasetOf(Obs.eventsAsObservations(spark, sfDir))
}
