package graft

import graft.core.Canon
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the canonical fingerprint serialization (graft.core.Canon) that
  * tools/manifest_check.py re-implements in Python. Every expected value
  * here is a SPEC constant — if one changes, the Python side must change
  * in lockstep (see the Canon scaladoc).
  */
class CanonSpec extends SparkSpec {

  test("cell forms match the documented spec") {
    assert(Canon.serCell(null, StringType) == "N")
    assert(Canon.serCell(true, BooleanType) == "b:1")
    assert(Canon.serCell(false, BooleanType) == "b:0")
    assert(Canon.serCell(42, IntegerType) == "i:42")
    assert(Canon.serCell(-7L, LongType) == "i:-7")
    // 1.5 = 0x3FF8000000000000 big-endian → little-endian bytes
    assert(Canon.serCell(1.5, DoubleType) == "f:000000000000f83f")
    assert(Canon.serCell(1.5f, FloatType) == "f:000000000000f83f")
    assert(Canon.serCell(Double.NaN, DoubleType) == "f:NaN")
    assert(Canon.serCell(new java.math.BigDecimal("1.20"), DecimalType(5, 2)) == "d:1.20")
    assert(Canon.serCell("héllo", StringType) == "s:héllo")
    assert(Canon.serCell(Array[Byte](0, 15, -1), BinaryType) == "x:000fff")
    val ts = java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 1))
    ts.setNanos(500000)
    assert(Canon.serCell(ts, TimestampType) == "t:1000500")
    assert(Canon.serCell(java.sql.Date.valueOf("1970-01-03"), DateType) == "D:2")
    assert(Canon.serCell(Seq(1, 2), ArrayType(IntegerType)) == "[i:1,i:2]")
    val st = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    assert(Canon.serCell(Row(1, "x"), st) == "{i:1,s:x}")
    assert(Canon.serCell(Map("b" -> 2, "a" -> 1),
      MapType(StringType, IntegerType)) == "m{s:a=i:1;s:b=i:2}")
  }

  test("negative timestamps floor-divide (pre-epoch)") {
    // 1969-12-31 23:59:59.5 UTC = -500000 µs
    val ts = new java.sql.Timestamp(-1000L) // -1 s epoch millis
    ts.setNanos(500000000)                  // +0.5 s
    assert(Canon.serCell(ts, TimestampType) == "t:-500000")
  }

  test("fingerprint is order-independent and matches a known vector") {
    import spark.implicits._
    val df1 = Seq((0, "click"), (1, "view")).toDF("datastream_id", "observation_type")
    val df2 = Seq((1, "view"), (0, "click")).toDF("datastream_id", "observation_type")
      .repartition(3)
    val f1 = Canon.fingerprint(df1)
    val f2 = Canon.fingerprint(df2)
    assert(f1.fp == f2.fp)
    assert(f1.rows == 2 && f2.rows == 2)
    assert(f1.schema == "datastream_id:int,observation_type:str")
    // known vector, verified against the Python half:
    //   md5("datastream_id=i:0\x01observation_type=s:click") first 16 hex
    //   + md5("datastream_id=i:0\x01...view-row...") summed mod 2^64
    val expected = {
      def h(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
      }
      "%016x".format(
        h("datastream_id=i:0\u0001observation_type=s:click") +
        h("datastream_id=i:1\u0001observation_type=s:view"))
    }
    assert(f1.fp == expected)
  }
}
