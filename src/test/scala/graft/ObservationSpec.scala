package graft

import graft.core.{Flags, Obs, Observation}

/** Typed Dataset surface: name-bound encoding, typed transformations. */
class ObservationSpec extends SparkSpec {
  import spark.implicits._

  test("events bind to Dataset[Observation] and support typed ops") {
    val ds = Observation.events(spark, "/root/testdata/sf0.001")
    val first = ds.filter(_.datastream_id == 0L).head()
    assert(first.qc_rank == Flags.NoQc && first.units == "unit")
    val perStream = ds.groupByKey(_.datastream_id).count().collect().toMap
    assert(perStream.values.sum == 1000L)
    // typed map keeps the compiler honest about the schema
    val shifted = ds.map(o => o.copy(result = o.result * 2)).head()
    assert(shifted.result == first.result * 2 ||
      shifted.iot_id != first.iot_id) // head order not guaranteed across ops
  }

  test("STA flattened frame binds too (with sensor metadata dropped)") {
    val fixture = "/root/reference/tests/resources/aums_data_request_response.json"
    assume(new java.io.File(fixture).exists())
    val ds = Observation.datasetOf(
      graft.sources.StaJson.readResponse(spark, fixture))
    assert(ds.count() > 8000)
    assert(ds.head().datastream_id > 0)
  }
}
