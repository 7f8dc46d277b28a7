package graft.sources.sta

import graft.core.Obs
import graft.sources.StaJson
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, In, LessThan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** S1/S2 — the SensorThings "sta" DataSource V2 (reference OData query
  * builder, `src/aums_data_request.py:36-77`; URL shape pinned
  * `tests/test_other.py:73-85`; threaded paged fetch `get_all_data`
  * `src/main.py:350-364`).
  *
  * v2 architecture: the scan COMPILES Catalyst pushdowns into the OData
  * request the reference builds by hand —
  *  - required columns  → `$select=` lists per entity level
  *  - time / stream filters → `$filter=phenomenonTime gt X and lt Y`,
  *    `datastream_id in (…)` (reference `filter_cfg_to_query`,
  *    `src/main.py:328-331`, pinned `tests/test_config.py:23-28`)
  *  - one input partition per (datastream, page) → parallel paged fetch
  *    replaces the reference's thread pool.
  *
  * Zero-egress environment: the "transport" reads captured response JSON
  * files from the `path` option (one response per file). The pushdown
  * compilation and partition planning — the parts that matter — are real
  * and unit-tested; swapping the transport for HTTP is localized in
  * [[StaPartitionReader]].
  *
  * Usage: `spark.read.format("graft.sources.sta").option("path", dir).load()`
  */
class StaSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StaSource.flatSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new StaTable(properties.get("path"),
      Option(properties.get("transport")).getOrElse("file"),
      Option(properties.get("datastreams")))
}

/** Registration alias: `spark.read.format("graft.sources.sta")` resolves
  * to `<package>.DefaultSource`.
  */
class DefaultSource extends StaSource

object StaSource {
  /** The flattened long-observations schema this source produces. */
  val flatSchema: StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField(Obs.DatastreamId, LongType),
      StructField("description", StringType),
      StructField(Obs.Units, StringType),
      StructField("observed_property_id", LongType),
      StructField(Obs.ObservationType, StringType),
      StructField("sensor", StringType),
      StructField(Obs.IotId, LongType),
      StructField(Obs.Result, DoubleType),
      StructField(Obs.Time, TimestampType),
      StructField(Obs.QcFlag, ByteType),
      StructField(Obs.Long_, DoubleType),
      StructField(Obs.Lat, DoubleType),
      StructField(Obs.FeatureId, LongType)))
  }

  /** Format a time filter value as the ISO-8601 literal OData expects
    * (Spark hands java.sql.Timestamp, or Instant under the Java-8 API
    * flag; a raw toString would emit '2024-01-01 00:15:00.0', which a
    * spec-compliant STA server rejects).
    */
  private def odataTime(v: Any): String = v match {
    case t: java.sql.Timestamp => t.toInstant.toString
    case i: java.time.Instant  => i.toString
    case s => s.toString
  }

  /** Compile pushed filters to the OData `$filter` string the reference
    * builds (`filter_cfg_to_query`): supported = time range on
    * phenomenonTime, IN on datastream_id. Everything else stays in Spark.
    */
  def compileODataFilter(filters: Seq[Filter]): (String, Seq[Filter], Seq[Filter]) = {
    // NOTE: IsNotNull is deliberately residual — it adds nothing to the
    // OData $filter, and a pushed (non-residual) filter must be fully
    // enforced by the reader, which cannot evaluate IsNotNull on a
    // column Spark pruned out of the required schema.
    val (pushable, residual) = filters.partition {
      case GreaterThan(Obs.Time, _) | LessThan(Obs.Time, _) => true
      case In(Obs.DatastreamId, _) => true
      case _ => false
    }
    val clauses = pushable.flatMap {
      case GreaterThan(Obs.Time, v) => Some(s"phenomenonTime gt ${odataTime(v)}")
      case LessThan(Obs.Time, v) => Some(s"phenomenonTime lt ${odataTime(v)}")
      case In(Obs.DatastreamId, vs) =>
        Some(vs.map(v => s"Datastream/id eq $v").mkString("(", " or ", ")"))
      case _ => None
    }
    (clauses.mkString(" and "), pushable, residual)
  }

  /** Compile pruned columns to per-entity `$select` lists (reference
    * `selection=[...]` trees, `src/aums_data_request.py:44-69`).
    */
  def compileSelect(required: StructType): Map[String, Seq[String]] = {
    val names = required.fieldNames.toSet
    def pick(m: Map[String, String]): Seq[String] =
      m.collect { case (col, sta) if names.contains(col) => sta }.toSeq
    Map(
      "Datastreams" -> pick(Map(Obs.DatastreamId -> "@iot.id",
        "description" -> "description", Obs.Units -> "unitOfMeasurement")),
      "Observations" -> pick(Map(Obs.IotId -> "@iot.id", Obs.Result -> "result",
        Obs.Time -> "phenomenonTime", Obs.QcFlag -> "resultQuality")),
      "FeatureOfInterest" -> pick(Map(Obs.Lat -> "feature", Obs.Long_ -> "feature",
        Obs.FeatureId -> "@iot.id"))
    ).filter(_._2.nonEmpty)
  }
}

/** @param transport "file" (captured response JSON, the test/sandbox
  *   path) or "http" (live paged GET against a SensorThings service —
  *   `path` is the collection URL, standard `@iot.nextLink` paging,
  *   bounded retries).
  * @param datastreams with http transport: comma-separated datastream ids
  *   — one input partition per id (the Spark-task replacement for the
  *   reference's fetch thread pool); absent = one partition for the
  *   whole collection.
  */
class StaTable(path: String, transport: String = "file",
               datastreams: Option[String] = None) extends Table with SupportsRead {
  override def name(): String = s"sta($path)"
  override def schema(): StructType = StaSource.flatSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StaScanBuilder(path, transport, datastreams)
}

class StaScanBuilder(path: String, transport: String = "file",
                     datastreams: Option[String] = None)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var requiredSchema: StructType = StaSource.flatSchema
  private var pushed: Array[Filter] = Array.empty
  private var odataFilter: String = ""

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (compiled, pushable, residual) = StaSource.compileODataFilter(filters.toSeq)
    odataFilter = compiled
    pushed = pushable.toArray
    residual.toArray // Spark re-applies these
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(required: StructType): Unit = {
    requiredSchema = required
  }
  override def build(): Scan =
    new StaScan(path, requiredSchema, odataFilter, pushed.toSeq, transport, datastreams)
}

class StaScan(path: String, required: StructType, odataFilter: String,
              pushedFilters: Seq[Filter] = Seq.empty,
              transport: String = "file",
              datastreams: Option[String] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StaScan(transport=$transport, odataFilter=[$odataFilter], " +
      s"select=[${StaSource.compileSelect(required)}])"

  /** File transport: one partition per captured response file. HTTP
    * transport: one partition per datastream id (each task runs its own
    * paged fetch — the reference's per-datastream threads become Spark
    * tasks), or a single whole-collection partition when no ids given.
    */
  override def planInputPartitions(): Array[InputPartition] =
    if (transport == "http") {
      val ids = datastreams.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      if (ids.isEmpty)
        Array(StaPartition(path, odataFilter, pushedFilters, http = true))
      else ids.map { id =>
        val idClause = s"Datastream/id eq $id"
        val f = if (odataFilter.isEmpty) idClause else s"$odataFilter and $idClause"
        StaPartition(path, f, pushedFilters, http = true): InputPartition
      }.toArray
    } else {
      val dir = new java.io.File(path)
      val files =
        if (dir.isDirectory) dir.listFiles().filter(_.getName.endsWith(".json")).map(_.getPath)
        else Array(path)
      files.sorted.map(f => StaPartition(f, odataFilter, pushedFilters): InputPartition)
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new StaReaderFactory(required)
}

case class StaPartition(file: String, odataFilter: String,
                        pushed: Seq[Filter] = Seq.empty,
                        http: Boolean = false) extends InputPartition

class StaReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new StaPartitionReader(p.asInstanceOf[StaPartition], required)
}

/** Parses one captured STA response and yields flattened rows. The HTTP
  * transport (paged GET with retry, reference `get_with_retry`
  * `src/main.py:107`) would replace `scala.io.Source.fromFile` here.
  */
class StaPartitionReader(p: StaPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  /** Epoch µs of a Filter value for the phenomenonTime column (Spark hands
    * java.sql.Timestamp, or java.time.Instant under the Java-8 API flag).
    */
  private def filterTimeUs(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    case i: java.time.Instant  => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case l: java.lang.Long     => l
    case s =>
      val i = java.time.Instant.parse(s.toString)
      i.getEpochSecond * 1000000L + i.getNano / 1000L // full µs, not ms-truncated
  }

  /** Enforce the pushed (non-residual) predicates on a parsed row: Spark
    * does NOT re-apply non-residual DSv2 filters, so a pushed filter the
    * transport ignores silently returns unfiltered data. In production
    * the server enforces the compiled `$filter`; the file transport
    * enforces the same semantics here, row by row.
    */
  private def keep(dsId: Long, timeUs: Long): Boolean =
    p.pushed.forall {
      case GreaterThan(Obs.Time, v) => timeUs > filterTimeUs(v)
      case LessThan(Obs.Time, v)    => timeUs < filterTimeUs(v)
      case In(Obs.DatastreamId, vs) =>
        vs.exists(x => x.asInstanceOf[Number].longValue == dsId)
      case _ => true // unknown pushed shape: keep (never claimed pushable)
    }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val fieldIdx = required.fieldNames.zipWithIndex.toMap

  /** Flatten one response document (either transport) to rows. */
  private def parse(root: com.fasterxml.jackson.databind.JsonNode): Iterator[InternalRow] = {
    val ds = root.path("Datastreams")
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    ds.forEach { d =>
      val obsArr = d.path("Observations")
      obsArr.forEach { o =>
        val row = new GenericInternalRow(required.length)
        def set(name: String, v: Any): Unit =
          fieldIdx.get(name).foreach(i => row.update(i, v))
        set(Obs.DatastreamId, d.path("@iot.id").asLong())
        set("description", UTF8String.fromString(d.path("description").asText("")))
        set(Obs.Units, UTF8String.fromString(d.path("unitOfMeasurement").path("name").asText("")))
        set("observed_property_id", d.path("ObservedProperty").path("@iot.id").asLong())
        set(Obs.ObservationType,
          UTF8String.fromString(d.path("ObservedProperty").path("name").asText("")))
        set("sensor", UTF8String.fromString(d.path("Sensor").path("name").asText("")))
        set(Obs.IotId, o.path("@iot.id").asLong())
        set(Obs.Result, o.path("result").asDouble())
        val inst = java.time.Instant.parse(o.path("phenomenonTime").asText())
        val timeUs = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        set(Obs.Time, timeUs)
        set(Obs.QcFlag, graft.core.Flags.wireToRank
          .getOrElse(o.path("resultQuality").asInt(0), graft.core.Flags.NoQc))
        val coords = o.path("FeatureOfInterest").path("feature").path("coordinates")
        if (coords.isArray && coords.size() >= 2) {
          set(Obs.Long_, coords.get(0).asDouble())
          set(Obs.Lat, coords.get(1).asDouble())
        }
        set(Obs.FeatureId, o.path("FeatureOfInterest").path("@iot.id").asLong())
        if (keep(d.path("@iot.id").asLong(), timeUs)) out += row
      }
    }
    out.iterator
  }

  /** Standard SensorThings paging: follow `@iot.nextLink` until absent
    * (reference pages with $top/$skip, `get_all_data` src/main.py:350-364;
    * nextLink is the STA-spec equivalent and server-agnostic). Fetched
    * lazily — a `limit(n)` query stops paging once satisfied.
    */
  private def httpPages(startUrl: String): Iterator[com.fasterxml.jackson.databind.JsonNode] =
    new Iterator[com.fasterxml.jackson.databind.JsonNode] {
      private var pending: Option[String] = Some(startUrl)
      override def hasNext: Boolean = pending.isDefined
      override def next(): com.fasterxml.jackson.databind.JsonNode = {
        val root = mapper.readTree(StaHttp.get(pending.get))
        val nl = root.path("@iot.nextLink")
        pending = if (nl.isMissingNode || nl.isNull || nl.asText().isEmpty) None
                  else Some(nl.asText())
        root
      }
    }

  private val rows: Iterator[InternalRow] =
    if (p.http) {
      val sep = if (p.file.contains("?")) "&" else "?"
      val url =
        if (p.odataFilter.isEmpty) p.file
        else s"${p.file}$sep%24filter=${StaHttp.enc(p.odataFilter)}"
      httpPages(url).flatMap(parse)
    } else parse(mapper.readTree(new java.io.File(p.file)))

  private var current: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { current = rows.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
