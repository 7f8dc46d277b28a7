package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Canonical, engine-independent result fingerprint.
  *
  * Purpose: `Verify` writes a per-query manifest (row count, schema,
  * content fingerprint) alongside the parquet dump so a correctness
  * verdict can be RECONSTRUCTED even if the oracle side never runs —
  * `tools/manifest_check.py` computes the same fingerprint from the
  * DuckDB oracle result and compares. The serialization below is the
  * spec both sides implement; change it in lockstep or not at all.
  *
  * Cell forms (type-prefixed so an int/float/decimal of equal numeric
  * value still mismatches, matching the strict compare gate):
  *   null      "N"
  *   boolean   "b:0" / "b:1"
  *   integral  "i:<decimal>"               (byte/short/int/long)
  *   float/dbl "f:NaN" | "f:<16 hex>"      (little-endian IEEE-754 double
  *                                          bits; floats widened first)
  *   decimal   "d:<plain string>"          (scale preserved, no exponent)
  *   string    "s:<utf8>"
  *   binary    "x:<hex>"
  *   timestamp "t:<epoch micros UTC>"
  *   date      "D:<epoch days>"
  *   array     "[" elem ("," elem)* "]"
  *   struct    "{" field ("," field)* "}"  (declared field order)
  *   map       "m{" k "=" v (";" k "=" v)* "}"  (sorted by serialized key)
  *
  * Row string: columns SORTED BY NAME, "name=" + cell, joined by U+0001 (prevents
  * concatenation ambiguity between adjacent name=value pairs).
  * Row hash: first 16 hex chars of md5(rowString) as an unsigned 64-bit
  * int. Table fingerprint: sum of row hashes mod 2^64, as 16-hex —
  * order-independent, so neither engine has to sort the result.
  */
object Canon {

  def serCell(v: Any, dt: DataType): String = (v, dt) match {
    case (null, _) => "N"
    case (b: Boolean, _) => if (b) "b:1" else "b:0"
    case (x: Byte, _) => s"i:$x"
    case (x: Short, _) => s"i:$x"
    case (x: Int, _) => s"i:$x"
    case (x: Long, _) => s"i:$x"
    case (x: Float, _) => serDouble(x.toDouble)
    case (x: Double, _) => serDouble(x)
    case (x: java.math.BigDecimal, _) => s"d:${x.toPlainString}"
    case (x: scala.math.BigDecimal, _) => s"d:${x.bigDecimal.toPlainString}"
    case (s: String, _) => s"s:$s"
    case (b: Array[Byte], _) => "x:" + b.map("%02x".format(_)).mkString
    case (t: java.sql.Timestamp, _) =>
      val micros = Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      s"t:$micros"
    case (t: java.time.Instant, _) =>
      s"t:${t.getEpochSecond * 1000000L + t.getNano / 1000L}"
    case (d: java.sql.Date, _) => s"D:${d.toLocalDate.toEpochDay}"
    case (d: java.time.LocalDate, _) => s"D:${d.toEpochDay}"
    case (a: scala.collection.Seq[_], ArrayType(et, _)) =>
      a.map(serCell(_, et)).mkString("[", ",", "]")
    case (r: Row, StructType(fields)) =>
      fields.indices.map(i => serCell(r.get(i), fields(i).dataType))
        .mkString("{", ",", "}")
    case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
      m.toSeq.map { case (k, vv) => (serCell(k, kt), serCell(vv, vt)) }
        .sortBy(_._1).map { case (k, vv) => s"$k=$vv" }
        .mkString("m{", ";", "}")
    case (other, _) =>
      throw new IllegalArgumentException(
        s"Canon: unhandled cell ${other.getClass.getName} for type $dt")
  }

  private def serDouble(d: Double): String =
    if (d.isNaN) "f:NaN"
    else {
      val bits = java.lang.Double.doubleToLongBits(d)
      val b = new StringBuilder(18); b.append("f:")
      var i = 0
      while (i < 8) { // little-endian byte order, matching struct.pack("<d")
        b.append("%02x".format((bits >>> (8 * i)) & 0xff)); i += 1 }
      b.toString
    }

  private def rowHash64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 bytes big-endian = first 16 hex chars of the digest
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (h(i) & 0xffL); i += 1 }
    acc
  }

  /** Schema signature: "name:type" sorted by column name, comma-joined.
    * Types use a small engine-neutral vocabulary so the Python side can
    * emit the same strings from DuckDB result dtypes. */
  def schemaSig(schema: StructType): String =
    schema.fields.map(f => s"${f.name}:${typeName(f.dataType)}")
      .sorted.mkString(",")

  private def typeName(dt: DataType): String = dt match {
    case BooleanType => "bool"
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType => "float"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case StringType => "str"
    case BinaryType => "bytes"
    case TimestampType | TimestampNTZType => "timestamp"
    case DateType => "date"
    case ArrayType(et, _) => s"array<${typeName(et)}>"
    case StructType(fs) =>
      fs.map(f => s"${f.name}:${typeName(f.dataType)}").mkString("struct<", ",", ">")
    case MapType(kt, vt, _) => s"map<${typeName(kt)},${typeName(vt)}>"
    case other => other.simpleString
  }

  final case class Fingerprint(rows: Long, schema: String, fp: String)

  /** Distributed: one pass, order-independent; safe at any scale. */
  def fingerprint(df: DataFrame): Fingerprint = {
    val schema = df.schema
    val sortedIdx: Array[(String, Int)] =
      schema.fieldNames.zipWithIndex.sortBy(_._1)
    val dts = schema.fields.map(_.dataType)
    val (cnt, sum) = df.rdd.mapPartitions { it =>
      var n = 0L; var acc = 0L
      it.foreach { row =>
        val s = sortedIdx.iterator
          .map { case (name, i) => name + "=" + serCell(row.get(i), dts(i)) }
          .mkString("\u0001")
        acc += rowHash64(s); n += 1
      }
      Iterator.single((n, acc))
    }.fold((0L, 0L)) { case ((n1, a1), (n2, a2)) => (n1 + n2, a1 + a2) }
    Fingerprint(cnt, schemaSig(schema), "%016x".format(sum))
  }
}
