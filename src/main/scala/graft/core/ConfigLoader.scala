package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** S10 — config source (reference hydra/omegaconf YAML composed in
  * `src/main.py:280-281`, validated by the Cerberus schema
  * `src/yaml_schema.py:45-224`).
  *
  * Spark-side equivalent: a JSON config document (same tree shape as the
  * reference's `conf/config.yaml`: `time`, `QC` keyed by datastream id,
  * `QC_global`, `QC_dependent`, `location`) parsed with Jackson (already
  * on the Spark classpath — no new dependency) into the typed case
  * classes of [[QcConfig]], with the same validation rules the Cerberus
  * schema enforces (bounds ordered, durations positive, ids positive).
  * CLI `k=v` overrides compose on top, mirroring hydra's override
  * grammar for the keys we use.
  */
object ConfigLoader {

  final case class Loaded(
      streams: Seq[StreamQc],
      global: GlobalQc,
      dependents: Seq[DependentConf],
      stabilization: Seq[StabilizationConf],
      timeStart: Option[String],
      timeEnd: Option[String])

  final case class ValidationError(path: String, message: String)

  /** µs precision — the reference's `dt_tolerance: 0.5s` is sub-second.
    * Units are an explicit anchored list, longest-first: the old
    * `(s|sec|min|m|h|hour)s?` form parsed "10ms" as 10 *minutes* (unit
    * 'm' + optional trailing 's'), silently mis-scaling by 60,000×.
    */
  def parseDurationUs(s: String): Long = {
    // reference durations: "0.5s", "10min", "20min", "1h" (yaml_schema regex)
    val m = raw"^([0-9]+(?:\.[0-9]+)?)\s*(hours|hour|mins|min|secs|sec|ms|h|m|s)$$".r
    s.trim match {
      case m(n, u) =>
        val mult = u match {
          case "ms" => 1e3
          case "s" | "sec" | "secs" => 1e6
          case "min" | "mins" | "m" => 60e6
          case "h" | "hour" | "hours" => 3600e6
        }
        (n.toDouble * mult).round
      case other => throw new IllegalArgumentException(s"bad duration: '$other'")
    }
  }

  def parseDurationSec(s: String): Long = math.round(parseDurationUs(s) / 1e6)

  /** O5 — config-template generation from a thing's datastream catalog
    * (reference `src/main.py:77-143`): derive a starting config document
    * from the observed data — per-stream range bounds widened from the
    * observed min/max, global z-score defaults — ready for hand-tuning.
    */
  def generateTemplate(obs: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.functions._
    val stats = obs.groupBy(col(Obs.DatastreamId))
      .agg(min(col(Obs.Result)).as("lo"), max(col(Obs.Result)).as("hi"))
      .orderBy(col(Obs.DatastreamId))
      .collect()
    val entries = stats.map { r =>
      val ds = r.getLong(0)
      val lo = math.floor(r.getDouble(1))
      val hi = math.ceil(r.getDouble(2))
      s"""    "$ds": {"range": {"min": $lo, "max": $hi}}"""
    }.mkString(",\n")
    s"""{
       |  "QC": {
       |$entries
       |  },
       |  "QC_global": {"zscore": {"min": -3, "max": 3, "time_window": "60min"}},
       |  "QC_dependent": [],
       |  "QC_stabilization": []
       |}""".stripMargin
  }

  /** Hydra/omegaconf-style env resolvers (reference `conf/config.yaml:24-25`
    * uses `${oc.env:VAR}`): `${oc.env:NAME}` (required) and
    * `${oc.env:NAME,default}`. Applied textually before parsing, like
    * omegaconf's string interpolation.
    */
  def interpolateEnv(doc: String, env: Map[String, String] = sys.env): String = {
    val re = raw"\$$\{oc\.env:([A-Za-z_][A-Za-z0-9_]*)(?:,([^}]*))?\}".r
    re.replaceAllIn(doc, m => {
      val v = env.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(
        throw new IllegalArgumentException(
          s"env var '${m.group(1)}' not set and no default given"))
      scala.util.matching.Regex.quoteReplacement(v)
    })
  }

  /** Multi-document composition, hydra-style: later documents override
    * earlier ones — objects deep-merge key-wise, scalars and arrays
    * replace wholesale (an override list REPLACES the base list, the
    * hydra default).
    */
  def compose(docs: Seq[String]): String = {
    require(docs.nonEmpty, "no config documents")
    val mapper = new ObjectMapper()
    mapper.writeValueAsString(docs.map(mapper.readTree).reduceLeft(deepMerge))
  }

  private def deepMerge(base: JsonNode, over: JsonNode): JsonNode =
    if (base.isObject && over.isObject) {
      val out = base.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
      over.properties().asScala.foreach { e =>
        if (out.has(e.getKey))
          out.set[JsonNode](e.getKey, deepMerge(out.get(e.getKey), e.getValue))
        else out.set[JsonNode](e.getKey, e.getValue)
      }
      out: JsonNode
    } else over

  /** Full composition pipeline: read files in order, interpolate env
    * resolvers, deep-merge, then parse/validate with CLI overrides last.
    */
  def loadFiles(paths: Seq[String], overrides: Map[String, String] = Map.empty,
                env: Map[String, String] = sys.env): Either[Seq[ValidationError], Loaded] = {
    val docs = paths.map { p =>
      interpolateEnv(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"), env)
    }
    load(compose(docs), overrides)
  }

  def load(json: String, overrides: Map[String, String] = Map.empty): Either[Seq[ValidationError], Loaded] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    val errs = scala.collection.mutable.ArrayBuffer.empty[ValidationError]

    def optD(n: JsonNode, f: String): Option[Double] =
      if (n.has(f) && !n.get(f).isNull) Some(n.get(f).asDouble()) else None

    def range(n: JsonNode, path: String): (Option[Double], Option[Double]) = {
      val lo = optD(n, "min"); val hi = optD(n, "max")
      for (l <- lo; h <- hi) if (l >= h)
        errs += ValidationError(path, s"min $l must be < max $h")
      (lo, hi)
    }

    val qc = root.path("QC")
    val streams = qc.properties().asScala.toSeq.map { e =>
      val id = e.getKey.toLong
      if (id <= 0) errs += ValidationError(s"QC.$id", "datastream id must be positive")
      val n = e.getValue
      val (rl, rh) = range(n.path("range"), s"QC.$id.range")
      val (gl, gh) = range(n.path("gradient"), s"QC.$id.gradient")
      val (zl, zh) = range(n.path("zscore"), s"QC.$id.zscore")
      StreamQc(id, rl, rh, gl, gh, zl, zh)
    }

    val g = root.path("QC_global")
    val (grl, grh) = range(g.path("range"), "QC_global.range")
    val (ggl, ggh) = range(g.path("gradient"), "QC_global.gradient")
    val (gzl, gzh) = range(g.path("zscore"), "QC_global.zscore")
    val zwin = if (g.path("zscore").has("time_window"))
      parseDurationSec(g.path("zscore").get("time_window").asText()) else 3600L
    if (zwin <= 0) errs += ValidationError("QC_global.zscore.time_window", "must be positive")
    val global = GlobalQc(grl, grh, ggl, ggh, gzl, gzh, zwin)

    val dependents = root.path("QC_dependent").elements().asScala.toSeq.map { n =>
      val tolUs = parseDurationUs(n.path("dt_tolerance").asText("0.5s"))
      if (tolUs <= 0) errs += ValidationError("QC_dependent.dt_tolerance", "must be positive")
      DependentConf(
        independentId = n.path("independent").asLong(),
        dependentId = n.path("dependent").asLong(),
        dtToleranceUs = tolUs,
        flagWhenMissing =
          if (n.has("flag_when_missing") && n.get("flag_when_missing").isNull) None
          else Some(n.path("flag_when_missing").asInt(Flags.Bad.toInt).toByte),
        secondaryRange = if (n.has("range"))
          Some((n.path("range").path("min").asDouble(), n.path("range").path("max").asDouble()))
        else None)
    }

    val stab = root.path("QC_stabilization").elements().asScala.toSeq.map { n =>
      StabilizationConf(
        datastreamId = n.path("datastream").asLong(),
        rangeMin = n.path("range").path("min").asDouble(),
        rangeMax = n.path("range").path("max").asDouble(),
        dtStabilizationSec = parseDurationSec(n.path("dt_stabilization").asText("20min")),
        maxAllowedDowntimeSec = parseDurationSec(n.path("max_allowed_downtime").asText("15min")))
    }

    val withOverrides = overrides.foldLeft(
      Loaded(streams, global, dependents, stab,
        Option(root.path("time").path("start").asText(null)),
        Option(root.path("time").path("end").asText(null)))) { (l, kv) =>
      kv match {
        case ("time.start", v) => l.copy(timeStart = Some(v))
        case ("time.end", v) => l.copy(timeEnd = Some(v))
        case (k, _) => errs += ValidationError(k, "unknown override key"); l
      }
    }
    if (errs.nonEmpty) Left(errs.toSeq) else Right(withOverrides)
  }
}
