package graft

import graft.functions.TextAnalysis
import org.scalatest.matchers.should.Matchers

/** Span corruption: substituting each sentinel in the corrupted text
  * with its span from the targets must reconstruct the original
  * (normalized) text exactly — masking is lossless by construction.
  */
class SpanCorruptionSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private val Sentinel = """<extra_id_(\d+)>""".r

  test("sentinel substitution round-trips to the original text") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again ok",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three",
      "solo")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextAnalysis.spanCorruption(docs, "doc_id", "text",
      spanLen = 3, selectMod = 2) // selectMod 2 masks ~half the slots
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (nSpans, nWords, corrupted, targets) = out(i.toLong)
      // parse targets: "<extra_id_k> w ..." groups in sentinel order
      val spans = Sentinel.split(targets).map(_.trim).drop(1)
      val ks = Sentinel.findAllMatchIn(targets).map(_.group(1).toInt).toSeq
      ks shouldBe (0 until nSpans.toInt)
      spans.map(s => if (s.isEmpty) 0 else s.split(" ").length).sum
        .toLong shouldBe nWords
      val rebuilt = Sentinel.replaceAllIn(corrupted,
        m => java.util.regex.Matcher.quoteReplacement(
          spans(m.group(1).toInt)))
        .replaceAll("\\s+", " ").trim
      rebuilt shouldBe t
    }
    // at selectMod 2 the long docs must actually mask something
    assert(out(0L)._1 >= 1)
  }

  test("masking is a pure function of (doc, slot): rerun identical") {
    val docs = Seq((7L, "a b c d e f g h i")).toDF("doc_id", "text")
    def run() = TextAnalysis.spanCorruption(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSeq
    run() shouldBe run()
  }
}
