package graft

import graft.functions.UnicodeNorm
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Native Unicode normalization expressions (UAX #15 via the JDK).
  * All non-ASCII characters appear as escapes — a source file with
  * literal composed/decomposed glyphs is visually ambiguous, which is
  * the very bug class under test.
  */
class UnicodeNormSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def run(s: String,
                  c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(Tuple1(s)).toDF("t").select(c($"t").as("r")).collect()(0).getString(0)

  test("NFC composes; NFD decomposes; both idempotent") {
    val composed = "\u00e9cole"
    val decomposed = "e\u0301cole"
    run(decomposed, UnicodeNorm.normalize(_, "NFC")) shouldBe composed
    run(composed, UnicodeNorm.normalize(_, "NFD")) shouldBe decomposed
    run(composed, UnicodeNorm.normalize(_, "NFC")) shouldBe composed
    // decomposed pair counts 2 chars, composes to 1
    Seq(Tuple1("e\u0301")).toDF("t")
      .select(char_length(UnicodeNorm.normalize($"t", "NFC"))).collect()(0)
      .getInt(0) shouldBe 1
  }

  test("NFKC folds compatibility forms (ligature, fullwidth)") {
    run("\ufb01le", UnicodeNorm.normalize(_, "NFKC")) shouldBe "file"
    run("\uff11\uff12\uff13", UnicodeNorm.normalize(_, "NFKC")) shouldBe "123"
  }

  test("stripAccents: marks drop, non-mark letters survive") {
    // u-umlaut -> u, e-acute -> e; sharp-s and o-slash
    // are single letters, not base+mark — they must survive
    run("m\u00fchl\u00e9i\u00dfen \u00f8", UnicodeNorm.stripAccents(_)) shouldBe
      "muhlei\u00dfen \u00f8"
    run("e\u0301cole", UnicodeNorm.stripAccents(_)) shouldBe "ecole"
    run("plain ascii", UnicodeNorm.stripAccents(_)) shouldBe "plain ascii"
  }

  test("null propagates; unknown form rejected") {
    val got = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(UnicodeNorm.normalize($"t", "NFC").as("r")).collect()(0)
    got.isNullAt(0) shouldBe true
    an[IllegalArgumentException] should be thrownBy
      UnicodeNorm.normalize(lit("x"), "NFX")
  }
}
