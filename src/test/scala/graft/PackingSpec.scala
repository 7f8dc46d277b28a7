package graft

import graft.functions.Packing
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Sequence packing: the two-phase distributed prefix sum must produce
  * an exact gapless layout of the token stream, independent of input
  * partitioning, with boundary-straddle bookkeeping that agrees with
  * the offsets.
  */
class PackingSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private val docs = (1L to 300L)
    .map(i => (i, Seq.fill((i % 37).toInt + 1)("tok").mkString(" ")))
    .toDF("doc_id", "text")
  private def tokens = org.apache.spark.sql.functions.size(
    org.apache.spark.sql.functions.split($"text", "\\s+"))

  test("layout is an exact gapless partition of [0, total_tokens)") {
    val out = Packing.packConcatSplit(docs, $"doc_id", tokens, seqLen = 64)
      .orderBy($"start_off").collect()
    assert(out.head.getAs[Long]("start_off") == 0L)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("start_off") + a.getAs[Long]("n_tokens") ==
        b.getAs[Long]("start_off")) // no gap, no overlap
    }
    val total = out.map(_.getAs[Long]("n_tokens")).sum
    val last = out.last
    assert(last.getAs[Long]("start_off") + last.getAs[Long]("n_tokens") == total)
  }

  test("deterministic and partitioning-independent") {
    val a = Packing.packConcatSplit(docs, $"doc_id", tokens, seqLen = 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("start_off")).toMap
    val b = Packing.packConcatSplit(docs.repartition(13), $"doc_id", tokens, seqLen = 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("start_off")).toMap
    assert(a == b)
  }

  test("sequence ids agree with offsets; straddle flagged iff boundary crossed") {
    val L = 64
    Packing.packConcatSplit(docs, $"doc_id", tokens, seqLen = L)
      .collect().foreach { r =>
        val (s, n) = (r.getAs[Long]("start_off"), r.getAs[Long]("n_tokens"))
        assert(r.getAs[Long]("seq_first") == s / L)
        assert(r.getAs[Long]("seq_last") == (s + n - 1) / L)
        assert((r.getAs[Long]("n_seqs") > 1) == (s / L != (s + n - 1) / L))
      }
  }

  test("zero-token documents are dropped from the stream") {
    val d = Seq((1L, 5L), (2L, 0L), (3L, 7L)).toDF("doc_id", "n")
    val out = Packing.packConcatSplit(d, $"doc_id", $"n", seqLen = 8)
    assert(out.select($"doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(out.agg(sum($"n_tokens")).head.getLong(0) == 12L)
  }

  test("packStats: totals, straddle count and tail padding are consistent") {
    val L = 64
    val packed = Packing.packConcatSplit(docs, $"doc_id", tokens, seqLen = L)
    val s = Packing.packStats(packed, L).head()
    val rows = packed.collect()
    assert(s.getAs[Long]("n_docs") == rows.length)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    assert(s.getAs[Long]("total_tokens") == total)
    val nSeqs = rows.map(_.getAs[Long]("seq_last")).max + 1
    assert(s.getAs[Long]("n_seqs") == nSeqs)
    assert(s.getAs[Long]("n_straddling") ==
      rows.count(_.getAs[Long]("n_seqs") > 1))
    assert(s.getAs[Long]("tail_padding") == nSeqs * L - total)
  }
}
