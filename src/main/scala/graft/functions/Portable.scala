package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable fixed-point math evaluated bit-identically by the Spark
  * engine and the DuckDB oracle.
  *
  * The one primitive here is `log2q16`: floor-truncated base-2 log of a
  * positive BIGINT in Q16 fixed point (16 fractional bits), computed by
  * the classic normalize + iterated-squaring algorithm (Knuth TAOCP
  * §1.2.2 ex. 25 / HAKMEM-style binary log) using ONLY 64-bit integer
  * multiply, compare and shift — no libm, no doubles, so the result is
  * reproducible across engines, platforms and compiler flags. Both
  * renderings (the Column fold below and the SQL CTE chain from
  * [[log2q16Sql]]) execute the same step sequence; `PortableLogSpec`
  * pins the Column form to an independent BigDecimal reference and the
  * driver's DuckDB gate pins the SQL form to the Column form.
  *
  * Why a portable log at all: BM25 idf and LM negative-log-likelihood
  * scores are log-scale by definition. `Math.log` differs from another
  * engine's libm in the last ulp, which flips floor()ed micro-units and
  * breaks hash-equality — the same reason the HLL sketch uses integer
  * register math ([[Sketches]]) and the quality classifier decides on
  * `logit >= 0` instead of a sigmoid ([[TextAnalysis]]).
  *
  * Algorithm (inputs x >= 1; x <= 0 is a documented precondition
  * violation and yields deterministic garbage rather than an error):
  *   1. normalize m to [2^30, 2^31) by binary-decomposed shifts,
  *      accumulating the exponent e = floor(log2 x) (right shifts
  *      truncate low bits — composition of floor divisions is exact);
  *   2. 16 rounds of m <- m^2 >> 30; each round emits one fraction bit
  *      (1 when the square reaches 2.0, i.e. >= 2^31, then renormalize);
  *   3. result = (e << 16) | fraction.
  * m stays < 2^31 so m*m < 2^62 never overflows a signed 64-bit long.
  * Max error vs true log2 is ~2^-16 + the mantissa truncation of step 1
  * (~2^-30 relative) — irrelevant for ranking/filtering, which only
  * need monotone-ish deterministic scores.
  */
object Portable {

  /** Right-normalization shift schedule (binary decomposition of up to
    * 63-30=33 bits down) and left schedule (up to 30 bits up). Shared
    * constants between the Column fold and the SQL generator so the two
    * renderings cannot drift.
    */
  val RightKs: Seq[Int] = Seq(32, 16, 8, 4, 2, 1)
  val LeftKs: Seq[Int] = Seq(16, 8, 4, 2, 1)
  val FracBits: Int = 16
  private val MantBits = 30

  private def sl(x: Column, n: Column): Column =
    call_function("shiftleft", x, n.cast("int"))
  private def sr(x: Column, n: Column): Column =
    call_function("shiftright", x, n.cast("int"))

  /** Q16 base-2 log of a positive integral column (see object doc).
    * Pure integer Column arithmetic; the iteration runs inside
    * `aggregate` higher-order folds so the expression tree stays
    * constant-size (a naive 27-step `when` chain would duplicate the
    * accumulator subtree exponentially).
    */
  def log2q16(xIn: Column): Column = {
    val x = xIn.cast("long")
    // phase 1a: shift right while m >= 2^(30+k), descending k
    val normR = aggregate(
      array(RightKs.map(k => lit(k.toLong)): _*),
      struct(x.as("m"), lit(30L).as("e")),
      (acc, k) => {
        val m = acc.getField("m"); val e = acc.getField("e")
        val cond = m >= sl(lit(1L), lit(MantBits.toLong) + k)
        struct(when(cond, sr(m, k)).otherwise(m).as("m"),
               when(cond, e + k).otherwise(e).as("e"))
      })
    // phase 1b: shift left while m < 2^(31-k), descending k
    val normL = aggregate(
      array(LeftKs.map(k => lit(k.toLong)): _*),
      normR,
      (acc, k) => {
        val m = acc.getField("m"); val e = acc.getField("e")
        val cond = m < sl(lit(1L), lit(MantBits.toLong + 1) - k)
        struct(when(cond, sl(m, k)).otherwise(m).as("m"),
               when(cond, e - k).otherwise(e).as("e"))
      })
    // phase 2: 16 squaring rounds, one fraction bit each
    val fin = aggregate(
      sequence(lit(1), lit(FracBits)),
      struct(normL.getField("m").as("m"), normL.getField("e").as("e"),
             lit(0L).as("f")),
      (acc, _) => {
        val m = acc.getField("m"); val e = acc.getField("e")
        val f = acc.getField("f")
        val m2 = sr(m * m, lit(MantBits))
        val hi = m2 >= lit(1L << (MantBits + 1))
        struct(when(hi, sr(m2, lit(1))).otherwise(m2).as("m"),
               e.as("e"),
               when(hi, f * 2 + 1).otherwise(f * 2).as("f"))
      })
    sl(fin.getField("e"), lit(FracBits)) + fin.getField("f")
  }

  /** Reference model of [[log2q16]] — a plain Long loop used by the
    * spec (and by driver-side planning code that wants the same number
    * without a DataFrame).
    */
  def log2q16Ref(x0: Long): Long = {
    var m = x0; var e = 30L
    for (k <- RightKs) if (m >= (1L << (30 + k))) { m >>= k; e += k }
    for (k <- LeftKs) if (m < (1L << (31 - k))) { m <<= k; e -= k }
    var f = 0L
    for (_ <- 1 to FracBits) {
      val m2 = (m * m) >> MantBits
      if (m2 >= (1L << 31)) { f = f * 2 + 1; m = m2 >> 1 }
      else { f = f * 2; m = m2 }
    }
    (e << FracBits) + f
  }

  /** DuckDB rendering: emits recursive-CTE text computing `outCol` =
    * log2q16(`xExpr`) for every row of `inCte`, carrying `keyCols`
    * through. Splice the result into a `WITH RECURSIVE` clause; read
    * the output from CTE `outCte(keyCols..., outCol)`.
    *
    * The normalization phases run as one 11-step recursion (steps 0-5 =
    * RightKs, 6-10 = LeftKs, schedules injected as list literals from
    * the SAME constants as the Column fold), then a 16-step squaring
    * recursion. All arithmetic is BIGINT; `<<`/`>>` are DuckDB's
    * integer shifts.
    */
  def log2q16Sql(inCte: String, keyCols: Seq[String], xExpr: String,
                 outCte: String, outCol: String): String = {
    val keys = keyCols.mkString(", ")
    val keysComma = if (keyCols.isEmpty) "" else keys + ", "
    val rks = RightKs.mkString("[", ", ", "]")
    val lks = LeftKs.mkString("[", ", ", "]")
    val nR = RightKs.length
    val nAll = RightKs.length + LeftKs.length
    val norm = s"${outCte}_n"
    val frac = s"${outCte}_f"
    s"""$norm($keysComma m, e, i) AS (
       |  SELECT $keysComma CAST($xExpr AS BIGINT), CAST(30 AS BIGINT), 0
       |  FROM $inCte
       |  UNION ALL
       |  SELECT $keysComma
       |    CASE WHEN i < $nR THEN
       |      CASE WHEN m >= (CAST(1 AS BIGINT) << (30 + ($rks)[i + 1]))
       |           THEN m >> ($rks)[i + 1] ELSE m END
       |    ELSE
       |      CASE WHEN m < (CAST(1 AS BIGINT) << (31 - ($lks)[i - ${nR - 1}]))
       |           THEN m << ($lks)[i - ${nR - 1}] ELSE m END END,
       |    CASE WHEN i < $nR THEN
       |      CASE WHEN m >= (CAST(1 AS BIGINT) << (30 + ($rks)[i + 1]))
       |           THEN e + ($rks)[i + 1] ELSE e END
       |    ELSE
       |      CASE WHEN m < (CAST(1 AS BIGINT) << (31 - ($lks)[i - ${nR - 1}]))
       |           THEN e - ($lks)[i - ${nR - 1}] ELSE e END END,
       |    i + 1
       |  FROM $norm WHERE i < $nAll),
       |$frac($keysComma m, e, f, i) AS (
       |  SELECT $keysComma m, e, CAST(0 AS BIGINT), 0
       |  FROM $norm WHERE i = $nAll
       |  UNION ALL
       |  SELECT $keysComma
       |    CASE WHEN ((m * m) >> 30) >= CAST(2147483648 AS BIGINT)
       |         THEN ((m * m) >> 30) >> 1 ELSE (m * m) >> 30 END,
       |    e,
       |    CASE WHEN ((m * m) >> 30) >= CAST(2147483648 AS BIGINT)
       |         THEN f * 2 + 1 ELSE f * 2 END,
       |    i + 1
       |  FROM $frac WHERE i < $FracBits),
       |$outCte AS (
       |  SELECT $keysComma (e << $FracBits) + f AS $outCol
       |  FROM $frac WHERE i = $FracBits)""".stripMargin
  }
}
