package graft.sources

import graft.core.{Flags, Obs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S3 — SensorThings (OGC STA) ingestion, v0: flatten captured OData
  * JSON responses into the long observations frame (reference
  * `response_datastreams_to_df`, used at `src/aums_data_request.py:166`;
  * nested shape pinned by `tests/resources/aums_data_request_response.json`:
  * `Datastreams[] → {@iot.id, name, description, unitOfMeasurement{name},
  * ObservedProperty, Sensor, Observations[] → {@iot.id, result,
  * phenomenonTime, resultQuality, FeatureOfInterest{feature{coordinates}}}}`).
  *
  * Spark-first: `from_json` with an explicit nested schema + two
  * `explode`s + nested-field selects — pure built-ins, columnar, no UDF.
  * The datastream metadata "join" is free: it rides along the outer
  * explode. A v2 DataSource with `$filter`/`$select` pushdown composes
  * the same flattening server-side (SURVEY §2.1 S1-S2).
  */
object StaJson {

  val observationSchema: StructType = StructType(Seq(
    StructField("@iot.id", LongType),
    StructField("result", DoubleType),
    StructField("phenomenonTime", StringType),
    StructField("resultQuality", StringType),
    StructField("FeatureOfInterest", StructType(Seq(
      StructField("@iot.id", LongType),
      StructField("feature", StructType(Seq(
        StructField("coordinates", ArrayType(DoubleType))))))))))

  val datastreamSchema: StructType = StructType(Seq(
    StructField("@iot.id", LongType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("unitOfMeasurement", StructType(Seq(StructField("name", StringType)))),
    StructField("ObservedProperty", StructType(Seq(
      StructField("@iot.id", LongType), StructField("name", StringType)))),
    StructField("Sensor", StructType(Seq(
      StructField("name", StringType), StructField("@iot.id", LongType),
      StructField("description", StringType)))),
    StructField("Observations", ArrayType(observationSchema))))

  val responseSchema: StructType =
    StructType(Seq(StructField("Datastreams", ArrayType(datastreamSchema))))

  /** Flatten one or more captured STA response JSON files into the long
    * observations frame. Empty datastreams drop out (inner explode),
    * matching the reference (streams 7854/7855 contribute no rows).
    */
  def readResponse(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("multiLine", "true").schema(responseSchema).json(path)
    flatten(raw)
  }

  def flatten(raw: DataFrame): DataFrame = {
    raw.select(explode(col("Datastreams")).as("ds"))
      .select(col("ds.`@iot.id`").as(Obs.DatastreamId),
        col("ds.description").as("description"),
        col("ds.unitOfMeasurement.name").as(Obs.Units),
        col("ds.ObservedProperty.`@iot.id`").as("observed_property_id"),
        col("ds.ObservedProperty.name").as(Obs.ObservationType),
        col("ds.Sensor.name").as("sensor"),
        explode(col("ds.Observations")).as("o"))
      .select(col(Obs.DatastreamId), col("description"), col(Obs.Units),
        col("observed_property_id"), col(Obs.ObservationType), col("sensor"),
        col("o.`@iot.id`").as(Obs.IotId),
        col("o.result").as(Obs.Result),
        to_timestamp(col("o.phenomenonTime")).as(Obs.Time),
        Flags.wireToRankCol(col("o.resultQuality").cast("int")).as(Obs.QcFlag),
        element_at(col("o.FeatureOfInterest.feature.coordinates"), 1).as(Obs.Long_),
        element_at(col("o.FeatureOfInterest.feature.coordinates"), 2).as(Obs.Lat),
        col("o.FeatureOfInterest.`@iot.id`").as(Obs.FeatureId))
  }
}
