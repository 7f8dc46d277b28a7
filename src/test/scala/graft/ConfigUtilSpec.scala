package graft

import graft.core.{ConfigLoader, Flags, Util}
import org.apache.spark.sql.functions._

/** S10/A8/G7 — config loading + validation (reference `src/yaml_schema.py`),
  * combine_dicts (pinned `tests/test_qc.py:973-978`), find_nearest_idx
  * (pinned `tests/test_other.py:200-212`).
  */
class ConfigUtilSpec extends SparkSpec {
  import spark.implicits._

  private val cfgJson =
    """{
      |  "time": {"start": "2024-01-01", "end": "2024-02-01"},
      |  "QC": {
      |    "7751": {"range": {"min": 0, "max": 20}, "gradient": {"min": -1, "max": 1}},
      |    "7770": {"range": {"min": 5, "max": 30}}
      |  },
      |  "QC_global": {"zscore": {"min": -3, "max": 3, "time_window": "60min"}},
      |  "QC_dependent": [
      |    {"independent": 7751, "dependent": 7770, "dt_tolerance": "0.5s",
      |     "range": {"min": 1, "max": 10}}
      |  ],
      |  "QC_stabilization": [
      |    {"datastream": 7751, "range": {"min": 1, "max": 6},
      |     "dt_stabilization": "20min", "max_allowed_downtime": "15min"}
      |  ]
      |}""".stripMargin

  test("config loads into typed model with duration parsing") {
    val Right(cfg) = ConfigLoader.load(cfgJson): @unchecked
    assert(cfg.streams.map(_.datastreamId).toSet == Set(7751L, 7770L))
    assert(cfg.global.zscoreWindowSec == 3600L)
    assert(cfg.dependents.head.dtToleranceUs == 500000L)
    assert(cfg.dependents.head.flagWhenMissing.contains(Flags.Bad))
    assert(cfg.stabilization.head.dtStabilizationSec == 1200L)
    assert(cfg.timeStart.contains("2024-01-01"))
  }

  test("validation rejects inverted bounds and bad overrides (yaml_schema parity)") {
    val bad = cfgJson.replace("\"min\": 0, \"max\": 20", "\"min\": 30, \"max\": 20")
    val Left(errs) = ConfigLoader.load(bad): @unchecked
    assert(errs.exists(_.path == "QC.7751.range"))
    val Left(errs2) = ConfigLoader.load(cfgJson, Map("nope.key" -> "x")): @unchecked
    assert(errs2.exists(_.path == "nope.key"))
  }

  test("CLI overrides compose like hydra k=v (time.start=...)") {
    val Right(cfg) = ConfigLoader.load(cfgJson, Map("time.start" -> "2025-01-01")): @unchecked
    assert(cfg.timeStart.contains("2025-01-01"))
  }

  test("duration grammar: s/min/h with fractions") {
    assert(ConfigLoader.parseDurationSec("0.5s") == 1L) // rounds
    assert(ConfigLoader.parseDurationSec("10min") == 600L)
    assert(ConfigLoader.parseDurationSec("2h") == 7200L)
    intercept[IllegalArgumentException](ConfigLoader.parseDurationSec("abc"))
    // "10ms" must be 10 milliseconds, not 10 minutes (the old
    // `(s|sec|min|m|h|hour)s?` regex parsed unit 'm' + trailing 's')
    assert(ConfigLoader.parseDurationUs("10ms") == 10000L)
    assert(ConfigLoader.parseDurationUs("10m") == 600000000L)
    assert(ConfigLoader.parseDurationUs("10mins") == 600000000L)
  }

  test("env interpolation + multi-file composition (hydra resolver parity)") {
    // ${oc.env:VAR} and ${oc.env:VAR,default} (reference config.yaml:24-25)
    val doc = """{"a": "${oc.env:GRAFT_A}", "b": "${oc.env:GRAFT_MISSING,fallback}"}"""
    val out = ConfigLoader.interpolateEnv(doc, Map("GRAFT_A" -> "hello"))
    assert(out == """{"a": "hello", "b": "fallback"}""")
    intercept[IllegalArgumentException](
      ConfigLoader.interpolateEnv("""{"x": "${oc.env:GRAFT_MISSING}"}""", Map.empty))

    // deep-merge: objects merge key-wise, scalars/arrays replace
    val base = """{"QC": {"1": {"range": {"min": 0, "max": 10}}},
                  |"QC_global": {"zscore": {"min": -3, "max": 3}},
                  |"QC_dependent": [{"independent": 1, "dependent": 2}]}""".stripMargin
    val overlay = """{"QC": {"2": {"range": {"min": 5, "max": 6}}},
                    |"QC_global": {"zscore": {"max": 4}},
                    |"QC_dependent": []}""".stripMargin
    val merged = ConfigLoader.compose(Seq(base, overlay))
    val loaded = ConfigLoader.load(merged).toOption.get
    assert(loaded.streams.map(_.datastreamId).toSet == Set(1L, 2L)) // objects merged
    assert(loaded.global.zscoreMax.contains(4.0)) // overlay wins
    assert(loaded.global.zscoreMin.contains(-3.0)) // base survives
    assert(loaded.dependents.isEmpty) // arrays replace wholesale
  }

  test("config template generation round-trips through the loader (O5, src/main.py:77-143)") {
    val obs = Seq((1L, 5.5), (1L, 19.2), (2L, -3.0), (2L, 7.7))
      .toDF(graft.core.Obs.DatastreamId, graft.core.Obs.Result)
    val tpl = ConfigLoader.generateTemplate(obs)
    val Right(cfg) = ConfigLoader.load(tpl): @unchecked
    assert(cfg.streams.map(s => s.datastreamId -> (s.rangeMin.get, s.rangeMax.get)).toMap ==
      Map(1L -> (5.0, 20.0), 2L -> (-3.0, 8.0)))
  }

  test("combine_dicts adds overlapping numeric/string values (test_qc.py:973-978)") {
    val merged = Util.combineDicts(
      Map("a" -> 1L, "b" -> "x", "c" -> 2.5),
      Map("a" -> 2L, "b" -> "y", "d" -> 7L))
    assert(merged == Map("a" -> 3L, "b" -> "xy", "c" -> 2.5, "d" -> 7L))
  }

  test("find_nearest_idx: argmin |arr - v|, first wins ties (test_other.py:200-212)") {
    val df = Seq((Seq(1.0, 5.0, 9.0), 6.0), (Seq(1.0, 5.0, 9.0), 7.0),
      (Seq(2.0, 4.0), 3.0)).toDF("arr", "v")
    val got = df.select(Util.findNearestIdx($"arr", $"v").as("i"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 1, 0)) // 7.0 ties 5 and 9 (|Δ|=2 both) -> first wins = idx 1
  }
}
