package graft

import graft.functions.{Cdc, CdcChunksExpr}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Content-defined chunking — exact-cover contract, the shift-resistance
  * property that motivates CDC over fixed-size blocks, dedup attribution,
  * and partitioning invariance.
  */
class CdcSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def mediaDf(rows: (Long, String)*) =
    rows.toDF("media_id", "text")
      .select($"media_id", lit("s").as("source"),
        encode($"text", "UTF-8").as("payload"))

  test("chunks exactly cover the payload; empty payload -> no chunks") {
    val text = (1 to 200).map(i => s"word$i").mkString(" ")
    val ch = Cdc.chunks(mediaDf(1L -> text)).orderBy("chunk_off").collect()
    ch.head.getAs[Long]("chunk_off") shouldBe 0L
    ch.map(_.getAs[Long]("chunk_len")).sum shouldBe text.getBytes("UTF-8").length
    ch.sliding(2).foreach {
      case Array(a, b) =>
        b.getAs[Long]("chunk_off") shouldBe
          a.getAs[Long]("chunk_off") + a.getAs[Long]("chunk_len")
      case _ =>
    }
    Cdc.chunks(mediaDf(2L -> "")).count() shouldBe 0L
  }

  test("insertion at the front preserves later chunk fingerprints (the CDC property)") {
    val base = (1 to 400).map(i => s"tok${i * 7}").mkString(" ")
    val shifted = "INSERTED PREFIX BYTES " + base
    val fps = Cdc.chunks(mediaDf(1L -> base, 2L -> shifted))
      .select($"media_id", $"chunk_fp").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    // all but the first boundary re-synchronize: the overwhelming majority
    // of the base chunks reappear verbatim in the shifted payload
    val common = fps(1L).intersect(fps(2L)).size
    common.toDouble should be >= fps(1L).size * 0.7
    // a fixed-size blocking of the same two payloads shares almost nothing:
    // 22 inserted bytes misalign every 64-byte block boundary
    val bb = base.getBytes("UTF-8"); val sb = shifted.getBytes("UTF-8")
    def blocks(a: Array[Byte]) = a.grouped(64).map(_.toSeq).toSet
    blocks(bb).intersect(blocks(sb)).size should be <= 1
  }

  test("average chunk size tracks 2^maskBits") {
    val text = scala.util.Random.javaRandomToRandom(new java.util.Random(11))
      .alphanumeric.take(20000).mkString
    val n = Cdc.chunks(mediaDf(1L -> text)).count()
    val avg = 20000.0 / n
    avg should be > 32.0
    avg should be < 128.0 // target 64
  }

  test("dedupStats: an exact copy's chunks are all duplicates; partitioning invariant") {
    val a = (1 to 300).map(i => s"alpha$i").mkString(" ")
    val b = (1 to 300).map(i => s"beta${i * 3}").mkString(" ")
    val df = Seq((1L, "s1", a), (2L, "s2", a), (3L, "s1", b))
      .toDF("media_id", "source", "text")
      .select($"media_id", $"source", encode($"text", "UTF-8").as("payload"))
    val stats = Cdc.dedupStats(df, Seq("source")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (n1, d1, bt1, bd1) = stats("s1")
    val (n2, d2, bt2, bd2) = stats("s2")
    // media 2 (s2) is byte-identical to media 1 (s1, lower id): every s2
    // chunk is a duplicate; s1's chunks are all firsts (b shares nothing)
    d2 shouldBe n2
    bd2 shouldBe bt2
    d1 shouldBe 0L
    bd1 shouldBe 0L
    val again = Cdc.dedupStats(df.repartition(17), Seq("source")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    again shouldBe stats
  }

  test("kernel: boundary rule matches the direct window-sum definition") {
    val bytes = (0 until 500).map(i => ((i * 131 + 7) % 251).toByte).toArray
    val out = CdcChunksExpr.compute(bytes, 16, 6)
    val ends = (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 3)
      r.getLong(0) + r.getLong(1)
    }
    // direct O(n*w) recomputation
    val M = 2147483647L; val B = 257L
    val direct = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (i <- 15 until bytes.length) {
      var h = 0L
      for (k <- 0 until 16) h = (h * B + (bytes(i - 15 + k) & 0xFF)) % M
      if ((h & 63) == 0) direct += (i + 1).toLong
    }
    if (direct.isEmpty || direct.last != bytes.length) direct += bytes.length.toLong
    ends shouldBe direct
  }
}
