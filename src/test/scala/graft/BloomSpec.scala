package graft

import graft.functions.Bloom
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Bloom filter pinned against an independent reference: the same
  * md5/Kirsch-Mitzenmacher construction re-implemented with
  * java.security.MessageDigest + BitSet (no Spark expressions shared),
  * so a drift in either the hash slicing, the double-hash schedule or
  * the word/bit packing breaks the comparison.
  */
class BloomSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // --- reference implementation (plain JVM, no Spark) -------------------
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60Ref(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def positionsRef(s: String, logM: Int, k: Int): Seq[Long] = {
    val m = 1L << logM
    val h = hash60Ref(s)
    val h1 = h % m
    val h2 = (h >>> logM) * 2 + 1
    (0 until k).map(i => (h1 + i * h2) % m)
  }

  private class RefBloom(logM: Int, k: Int) {
    val bits = new java.util.BitSet(1 << logM)
    def add(s: String): Unit =
      positionsRef(s, logM, k).foreach(p => bits.set(p.toInt))
    def query(s: String): Boolean =
      positionsRef(s, logM, k).forall(p => bits.get(p.toInt))
  }

  test("hash60 matches the Spark md5-prefix expression") {
    val keys = Seq("alpha", "beta gamma", "", "ünïcode")
    val got = keys.toDF("s").select(Bloom.hash60(col("s")))
      .collect().map(_.getLong(0)).toSeq
    got shouldBe keys.map(hash60Ref)
  }

  test("no false negatives; membership matches the reference exactly") {
    val members = (0 until 200).map(i => s"member_$i")
    val probes = members ++ (0 until 400).map(i => s"other_$i")
    val (logM, k) = (10, 3) // 1024 bits, 200*3 insertions: dense -> FPs
    val ref = new RefBloom(logM, k)
    members.foreach(ref.add)

    val bloom = Bloom.build(members.toDF("g"), col("g"), logM, k)
    val got = Bloom.probe(probes.toDF("key"), col("key"), bloom, logM, k,
        "hit").collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

    members.foreach(mk => assert(got(mk), s"false negative on $mk"))
    probes.foreach(p => got(p) shouldBe ref.query(p))
    // the dense configuration must actually exercise the FP path
    val fps = probes.drop(200).count(got(_))
    assert(fps > 0, "test configuration produced no false positives")
    assert(fps < 400, "filter saturated: every non-member hit")
  }

  test("bit packing: words carry only 32 bits, all probes land in range") {
    val bloom = Bloom.build((0 until 50).map(i => s"k$i").toDF("g"),
      col("g"), 8, 2).collect()
    bloom.foreach { r =>
      val (w, b) = (r.getLong(0), r.getLong(1))
      assert(w >= 0 && w < 8, s"word_idx $w out of range for m=256")
      assert((b & ~0xffffffffL) == 0L, s"bits above bit 31 set: $b")
      assert(b != 0L)
    }
  }

  test("bloomDecontaminate: contaminated docs flagged, FPs non-negative") {
    val bench = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val corpus = Seq(
      (2L, "a b c d e f g h x y"),        // passage 0 == bench window 0
      (3L, "zz yy xx ww vv uu tt ss"),    // clean
      (4L, "c d e f g h i j k l")         // passage 0 == bench window 2
    ).toDF("doc_id", "text")
    val got = Bloom.bloomDecontaminate(corpus, bench, "doc_id", "text",
        passageLen = 8, logM = 16, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6))).toMap
    got(2L) shouldBe ((1L, 1L, 0L, true, true))
    got(3L)._2 shouldBe 0L               // no exact hit
    got(3L)._4 shouldBe false
    got(4L) shouldBe ((1L, 1L, 0L, true, true))
    // false positives can never be negative (bloom has no false negatives)
    got.values.foreach(v => assert(v._3 >= 0L))
  }
}
