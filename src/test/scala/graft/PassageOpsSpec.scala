package graft

import graft.functions.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Sub-document span operators (passage dedup, boilerplate removal),
  * the unigram-rank quality proxy, and mixture sampling.
  */
class PassageOpsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("passageDedup: first-seen wins, later occurrences cut, docs rebuilt") {
    val docs = Seq(
      (1L, "a b c d e f g h"),         // p0="a b c d" p1="e f g h" both first
      (2L, "a b c d x y z w"),         // p0 dups doc1.p0 → cut; p1 kept
      (3L, "e f g h e f g h"),         // both passages dup doc1.p1 → emptied
      (4L, "q r s t q r s t")          // within-doc repeat: p1 dups own p0
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedup(docs, "doc_id", "text", passageLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((2L, 2L, "a b c d e f g h"))
    out(2L) shouldBe ((2L, 1L, "x y z w"))
    out(3L) shouldBe ((2L, 0L, ""))    // lost everything, row survives
    out(4L) shouldBe ((2L, 1L, "q r s t"))
  }

  test("passageDedup: survivors independent of partitioning") {
    val docs = (1L to 60L)
      .map(i => (i, s"shared lead in text here unique tail ${i % 7} word $i"))
      .toDF("doc_id", "text")
    val a = Dedup.passageDedup(docs, "doc_id", "text", passageLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    val b = Dedup.passageDedup(docs.repartition(13), "doc_id", "text", passageLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    a shouldBe b   // min(struct) ordering, not arrival order
  }

  test("exactSubstringSpans: finds straddling spans passageDedup misses") {
    // the 4-token span "p q r s" sits at offset 2 in doc 1 and offset 5
    // in doc 2 — NON-aligned to any fixed 4-block boundary in either
    // doc, so aligned-passage dedup (len 4: blocks [0,4) [4,8)...)
    // never hashes it as a unit in both docs; stride-1 windows do.
    val docs = Seq(
      (1L, "a b p q r s c d"),
      (2L, "e f g h i p q r s j")
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(docs, "doc_id", "text", windowLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spans shouldBe Set((1L, 2L, 4L), (2L, 5L, 4L))
    // passageDedup provably misses it: nothing is cut
    val pd = Dedup.passageDedup(docs, "doc_id", "text", passageLen = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    pd(1L) shouldBe 2L   // all passages kept
    pd(2L) shouldBe 3L
  }

  test("exactSubstringSpans: overlapping dup windows merge to ONE maximal span") {
    // 6 shared tokens with L=4 → 3 duplicated offsets per doc, one span
    val docs = Seq(
      (1L, "x1 u v w p q r x2"),
      (2L, "y1 y2 u v w p q r")
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(docs, "doc_id", "text", windowLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spans shouldBe Set((1L, 1L, 6L), (2L, 2L, 6L))
  }

  test("exactSubstringDedup: first occurrence keeps text, later lose the span") {
    val docs = Seq(
      (1L, "a b p q r s c d"),
      (2L, "e f g h i p q r s j"),
      (3L, "short doc")                      // < windowLen: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDedup(docs, "doc_id", "text", windowLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((8L, 0L, "a b p q r s c d"))   // canonical: kept whole
    out(2L) shouldBe ((10L, 4L, "e f g h i j"))      // span cut at offset 5
    out(3L) shouldBe ((2L, 0L, "short doc"))
  }

  test("exactSubstringDedup: within-doc repeat cut; partitioning-independent") {
    val docs = Seq(
      (1L, "m n o p z z m n o p"),   // self-repeat of "m n o p"
      (2L, "w x y v unrelated tokens here")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDedup(docs, "doc_id", "text", windowLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((10L, 4L, "m n o p z z"))
    out(2L)._2 shouldBe 0L
    val a = Dedup.exactSubstringDedup(docs, "doc_id", "text", windowLen = 4)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    val b = Dedup.exactSubstringDedup(docs.repartition(7), "doc_id", "text",
        windowLen = 4)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    a shouldBe b
  }

  test("exactSubstringDecontaminate: leaked span cut at ANY offset; aligned form misses it") {
    val bench = Seq((100L, "the exact answer is forty two")).toDF("doc_id", "text")
    // the 4-token benchmark span "answer is forty two" sits at corpus
    // offset 3 — not aligned to any 4-block; a clean doc is untouched
    val corpus = Seq(
      (1L, "w1 w2 w3 answer is forty two w8"),
      (2L, "totally unrelated clean document here")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDecontaminate(corpus, bench,
        "doc_id", "text", windowLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((8L, 4L, "w1 w2 w3 w8"))
    out(2L) shouldBe ((5L, 0L, "totally unrelated clean document here"))
    // the aligned-passage form provably keeps the leak (blocks
    // [w1 w2 w3 answer] and [is forty two w8] match no benchmark 4-gram
    // as units at those alignments — both survive)
    val pd = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text",
      passageLen = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    pd(1L) shouldBe 2L // all passages kept — the leak survives
  }

  test("longestRepeatedSubstring: exact length via doubling + binary search") {
    // longest repeat: "q r s t u" (5 tokens, across docs 1 and 2);
    // the merged-run trap is avoided: "a b" and "b c" both repeat but
    // "a b c" never does, so lrs must NOT report the merged span
    val docs = Seq(
      (1L, "q r s t u x1 a b c"),
      (2L, "y1 q r s t u a b x2"),
      (3L, "b c z1 z2 z3")
    ).toDF("doc_id", "text")
    val r = Dedup.longestRepeatedSubstring(docs, "doc_id", "text").collect().head
    r.getLong(0) shouldBe 5L
    r.getLong(1) shouldBe 1L   // exactly one 5-token text repeats
    // no repeats at all → (0, 0)
    val uniq = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val r0 = Dedup.longestRepeatedSubstring(uniq, "doc_id", "text").collect().head
    (r0.getLong(0), r0.getLong(1)) shouldBe ((0L, 0L))
    // whole-document duplicate → lrs = doc length
    val dup = Seq((1L, "m n o p"), (2L, "m n o p")).toDF("doc_id", "text")
    Dedup.longestRepeatedSubstring(dup, "doc_id", "text")
      .collect().head.getLong(0) shouldBe 4L
  }

  test("removeBoilerplate: shared passage cut EVERYWHERE, unique text kept") {
    val docs = Seq(
      (1L, "cookie banner text here body one alpha beta"),
      (2L, "cookie banner text here body two gamma delta"),
      (3L, "cookie banner text here body three epsilon zeta"),
      (4L, "entirely unique document four has no chrome")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(docs, "doc_id", "text",
      passageLen = 4, maxDf = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // "cookie banner text here" spans 3 docs → boilerplate: cut from ALL
    // THREE (passage dedup would have kept doc 1's copy — the difference)
    out(1L) shouldBe ((2L, 1L, "body one alpha beta"))
    out(2L) shouldBe ((2L, 1L, "body two gamma delta"))
    out(3L) shouldBe ((2L, 1L, "body three epsilon zeta"))
    out(4L) shouldBe ((2L, 2L, "entirely unique document four has no chrome"))
  }

  test("removeBoilerplate: prunes with a broadcast left-anti join") {
    val docs = (1L to 50L).map(i => (i, s"chrome header row doc body $i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(docs, "doc_id", "text",
      passageLen = 3, maxDf = 1L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
  }

  test("decontaminate: passages matching benchmark n-grams at ANY offset are cut") {
    val bench = Seq((100L, "q w e r t y")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c w e r d e f"),   // "w e r" = benchmark 3-gram at offset 1
      (2L, "q w x y z")            // "q w x" matches nothing; short tail kept
    ).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text",
      passageLen = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((3L, 2L, "a b c d e f"))  // non-aligned overlap caught
    out(2L) shouldBe ((2L, 2L, "q w x y z"))
  }

  test("tokenRankScore: exact integer ranks, ties broken by token text") {
    val docs = Seq((1L, "the the cat"), (2L, "the dog")).toDF("doc_id", "text")
    // corpus counts: the=3, cat=1, dog=1 → ranks the=1, cat=2, dog=3
    val out = TextAnalysis.tokenRankScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out(1L) shouldBe ((3L, 4L, 1333333L))  // 1+1+2, ×1e6 div 3
    out(2L) shouldBe ((2L, 4L, 2000000L))  // 1+3, ×1e6 div 2
  }

  test("c4Filters: each rule kills its own pathology, clean doc passes") {
    val docs = Seq(
      (1L, "a perfectly clean document with enough words here"),
      (2L, "code like function() { return 1 } inline"),
      (3L, "Lorem Ipsum dolor sit amet filler text here"),
      (4L, "please enable JavaScript to view this content"),
      (5L, "too short")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Filters(docs, "doc_id", "text", minWords = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5)))).toMap
    out(1L) shouldBe ((true, true, true, true, true))
    out(2L) shouldBe ((false, true, true, true, false))  // braces
    out(3L) shouldBe ((true, false, true, true, false))  // lorem ipsum
    out(4L) shouldBe ((true, true, false, true, false))  // javascript
    out(5L) shouldBe ((true, true, true, false, false))  // word floor
  }

  test("linearQualityScore: hand-computed integer logit, keep = logit >= 0") {
    val docs = Seq((1L, "the cat sat"), (2L, "x")).toDF("doc_id", "text")
    // doc 1: nt=3 nc=11 na=9 stop=1 mwl=11000 div 3=3666
    //   logit = 10 + 1·3 + 2·11 + 3·9 + 1000·1 + 1·3666 = 4728
    // doc 2: nt=1 nc=1 na=1 stop=0 mwl=1000
    //   logit = 10 + 1 + 2 + 3 + 0 + 1000 = 1016; with bias -2000 → -984
    val out = TextAnalysis.linearQualityScore(docs, "doc_id", "text",
      wTokensMicro = 1L, wCharsMicro = 2L, wAlphaMicro = 3L,
      wStopMicro = 1000L, wMwlMicro = 1L, biasMicro = 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    out(1L) shouldBe ((4728L, true))
    out(2L) shouldBe ((1016L, true))
    val neg = TextAnalysis.linearQualityScore(docs, "doc_id", "text",
      1L, 2L, 3L, 1000L, 1L, biasMicro = -2000L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    neg(1L) shouldBe true    // 2718 >= 0
    neg(2L) shouldBe false   // -994 < 0
  }

  test("mixtureSample: budget ≥ corpus keeps all; equal strata get equal rates") {
    val docs = (1L to 300L).map { i =>
      (i, s"src${i % 3}", "one two three four five")   // 5 tokens each
    }.toDF("doc_id", "source", "text")
    val all = Sampling.mixtureSample(docs, $"doc_id", $"source",
      TextAnalysis.wsTokenCount($"text"), budgetTokens = 10000L, salt = "m1")
    all.count() shouldBe 300L              // 1500-token corpus, rate caps at 1
    val sampled = Sampling.mixtureSample(docs, $"doc_id", $"source",
      TextAnalysis.wsTokenCount($"text"), budgetTokens = 750L, salt = "m1")
    val rates = sampled.select($"stratum", $"rate_micro").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.values.toSet.size shouldBe 1     // identical mass → identical rate
    // half the tokens asked → rate ≈ 0.5 (integer floors keep it ≤)
    assert(rates.values.head > 400000L && rates.values.head <= 500000L)
    val kept = sampled.agg(sum($"n_tokens")).head().getLong(0)
    assert(kept > 500L && kept <= 800L)    // lands near the budget
  }

  test("mixtureRepeat: upsampling emits repeats; expected tokens hit the target") {
    // one stratum, 100 docs × 8 tokens = 800 tokens; budget 2000 →
    // rate 2.5: every doc gets 2 copies, ~half get a third
    val docs = (1L to 100L).map(i => (i, "s", "a b c d e f g h"))
      .toDF("doc_id", "source", "text")
    val out = Sampling.mixtureRepeat(docs, $"doc_id", $"source",
      graft.functions.TextAnalysis.wsTokenCount($"text"),
      budgetTokens = 2000L, salt = "r1")
    val perDoc = out.groupBy($"key").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.values.forall(c => c == 2L || c == 3L))
    val total = out.agg(sum($"n_tokens")).head().getLong(0)
    assert(total > 1800L && total <= 2200L, s"emitted $total of 2000 target")
    // copy indices tile 0..copies-1
    val copies = out.filter($"key" === 1L).select($"copy")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(copies == copies.indices.map(_.toLong))
    // determinism across partitioning
    val out2 = Sampling.mixtureRepeat(docs.repartition(7), $"doc_id", $"source",
      graft.functions.TextAnalysis.wsTokenCount($"text"), 2000L, "r1")
    assert(out2.groupBy($"key").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == perDoc)
  }

  test("mixtureSample: deterministic, partitioning-independent, sqrt upweights small strata") {
    val docs = ((1L to 240L).map(i => (i, "big", "a b c d e f g h")) ++
      (241L to 270L).map(i => (i, "small", "a b c d e f g h")))
      .toDF("doc_id", "source", "text")
    val s1 = Sampling.mixtureSample(docs, $"doc_id", $"source",
      TextAnalysis.wsTokenCount($"text"), budgetTokens = 1000L, salt = "m2")
    val s2 = Sampling.mixtureSample(docs.repartition(11), $"doc_id", $"source",
      TextAnalysis.wsTokenCount($"text"), budgetTokens = 1000L, salt = "m2")
    val k1 = s1.select($"key").collect().map(_.getLong(0)).toSet
    s2.select($"key").collect().map(_.getLong(0)).toSet shouldBe k1
    val rates = s1.select($"stratum", $"rate_micro").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // temperature 0.5: the 8× bigger stratum gets only √8× the tokens,
    // so its keep RATE is ~√8 ≈ 2.83× LOWER than the small stratum's
    val ratio = rates("small").toDouble / rates("big").toDouble
    assert(ratio > 2.5 && ratio < 3.2, s"rates=$rates ratio=$ratio")
  }

  test("Flesch readability: hand-computed counts and micro score") {
    val s = spark; import s.implicits._
    val docs = Seq(
      // 6 words, 2 sentences ("..." is ONE [.!?]+ run), syllable groups:
      // the(1) cat(1) sat(1) here(2: e,e? -> 'here' = e+e = 2 groups)
      (1L, "The cat sat here. It ran!"),
      (2L, "word")  // no punctuation -> 1 sentence floor
    ).toDF("doc_id", "text")
    val got = TextAnalysis.fleschOnto(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (w1, s1, y1, f1) = got(1L)
    assert(w1 == 6L && s1 == 2L, s"counts: ${got(1L)}")
    // reference replay of the integer formula
    assert(f1 == 206835000L - 1015000L * w1 / s1 - 84600000L * y1 / w1)
    val (w2, s2b, y2, f2) = got(2L)
    assert((w2, s2b, y2) == (1L, 1L, 1L))
    assert(f2 == 206835000L - 1015000L - 84600000L)
  }
}
