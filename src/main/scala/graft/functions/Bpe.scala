package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Subword tokenization — the step that turns packed word streams into
  * trainable token-id shards (reference counterpart: the curation
  * pipelines the reference feeds; its own tree stops at word counts,
  * so this is part of the LLM-pipeline layer, not a port).
  *
  * Model: a VOCABULARY of subword pieces (BPE merges flattened to their
  * surface strings + the single-character alphabet), applied by greedy
  * longest-match from each position — the standard inference-time
  * shortcut for BPE/WordPiece-family vocabularies (Sennrich et al. 2016
  * learn merges; SentencePiece/WordPiece apply longest-match). Applying
  * is a pure per-row function of (text, vocab): map-side, zero shuffle,
  * embarrassingly parallel at 100 TB. The vocab ships inside the plan
  * (≤ a few hundred KB for a 50k vocab) — the broadcast-small-side
  * pattern, no join needed because the lookup is a per-char trie walk,
  * not an equi-key.
  *
  * Id contract (fixed, engine-portable, so a DuckDB oracle can replay
  * it): id 0 is reserved `<unk>`; pieces are numbered 1.. in vocab
  * order. A position matching no piece emits 0 and advances one char —
  * encoding never fails and never stalls. Words are the (normalized)
  * space-separated tokens; spaces themselves produce no id, so
  * `decode` of a multi-word text yields the words concatenated.
  */
object Bpe {

  /** A subword vocabulary. `pieces(i)` has token id `i + 1`; id 0 is
    * `<unk>`. Pieces must be non-empty, space-free and distinct (two
    * equal pieces would make longest-match ids ambiguous).
    */
  final case class Vocab(pieces: IndexedSeq[String]) {
    require(pieces.nonEmpty, "empty vocab")
    require(pieces.forall(p => p.nonEmpty && !p.contains(' ')),
      "pieces must be non-empty and space-free")
    require(pieces.distinct.size == pieces.size, "duplicate pieces")
    val UnkId = 0
    def size: Int = pieces.size + 1 // + <unk>
  }

  /** Encode normalized text to token ids (`array<int>`), greedy
    * longest-match per word. Input contract: the caller passes
    * [[TextAnalysis.normalized]] text (single spaces); this mirrors the
    * whitespace tokenization every other gate counts, so the two
    * tokenizations segment words identically.
    */
  def encode(normText: Column, vocab: Vocab): Column =
    GraftExpressionBridge.column(
      BpeEncodeExpr(GraftExpressionBridge.expression(normText), vocab.pieces))

  /** Inverse of [[encode]] for inspection/specs: ids back to surface
    * text (words concatenate — spaces emit no id). Unknown id 0 renders
    * as `⁇` (double question mark), never a piece.
    */
  def decode(ids: Column, vocab: Vocab): Column = {
    val withUnk = "⁇" +: vocab.pieces
    array_join(transform(ids, i => element_at(lit(withUnk.toArray), i + 1)), "")
  }

  /** Learn a BPE vocabulary from a corpus — the classic frequency-driven
    * merge loop (Sennrich et al. 2016) over the corpus' word-frequency
    * table, with the same scale shape as the ANN codebooks
    * ([[Similarity]]): TRAIN ON A BOUNDED SAMPLE, apply distributed.
    * The word-frequency aggregation is one distributed groupBy; only
    * the top `maxWords` (word, count) rows — a bounded, Heaps-law-small
    * frame — reach the driver, where the merge loop runs locally.
    * Deterministic: ties in pair frequency break lexicographically, so
    * the same corpus always yields the same vocab.
    *
    * Returns pieces = single-character alphabet (sorted) ++ merged
    * pieces in merge order. `nMerges` is an upper bound: merging stops
    * early when no pair repeats.
    */
  def learn(df: DataFrame, textCol: String, nMerges: Int,
            maxWords: Int = 65536): Vocab = {
    val wordFreq = df
      .select(explode(TextAnalysis.wsTokens(
        TextAnalysis.normalized(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    val alphabet = wordFreq.iterator.flatMap(_._1.iterator)
      .toSet.toIndexedSeq.sorted.map((_: Char).toString)

    // word as current piece sequence, weighted by corpus frequency
    var words: Array[(Array[String], Long)] =
      wordFreq.map { case (w, n) => (w.toCharArray.map(_.toString), n) }
    val merges = Vector.newBuilder[String]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val pairCount = scala.collection.mutable.Map[(String, String), Long]()
      for ((ps, n) <- words; i <- 0 until ps.length - 1)
        pairCount.updateWith((ps(i), ps(i + 1)))(c => Some(c.getOrElse(0L) + n))
      // the best pair: max weighted count, lexicographic tie-break
      val best = pairCount.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          merges += (a + b)
          words = words.map { case (ps, n) =>
            val out = Array.newBuilder[String]
            var i = 0
            while (i < ps.length) {
              if (i < ps.length - 1 && ps(i) == a && ps(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += ps(i); i += 1 }
            }
            (out.result(), n)
          }
          m += 1
      }
    }
    Vocab(alphabet.toIndexedSeq ++ merges.result())
  }

  /** Fixed demonstration vocabulary for oracle-checked queries: the
    * lowercase alphanumeric alphabet + common punctuation + a hand
    * -picked set of frequent English merges. Deterministic and embedded
    * in BOTH the Spark plan and the DuckDB oracle SQL (via
    * [[vocabValuesSql]] generated from this same object), so the two
    * sides cannot drift.
    */
  val demoVocab: Vocab = Vocab(
    (('a' to 'z') ++ ('0' to '9')).map(_.toString).toIndexedSeq ++
      IndexedSeq(".", ",", "-", "_", "'", ":", ";", "!", "?", "(", ")", "/") ++
      IndexedSeq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
        "or", "es", "st", "ar", "te", "ng", "al", "it", "is", "to", "ou",
        "ed", "ing", "ion", "ent", "the", "and", "tion"))

  /** The vocabulary as a SQL `VALUES` body `(id, piece, plen), …` for
    * the oracle's longest-match replay (ids match [[encode]]'s: 1-based
    * vocab order; the oracle expresses `<unk>` as the COALESCE default).
    */
  def vocabValuesSql(vocab: Vocab): String =
    vocab.pieces.zipWithIndex.map { case (p, i) =>
      s"(${i + 1}, '${p.replace("'", "''")}', ${p.length})"
    }.mkString(", ")

  /** Overlapping fixed-size chunks of BPE token ids per document —
    * [[TextAnalysis.tokenChunks]] with a learned vocabulary instead of
    * word strings: (id, chunk_idx, n_tokens, ids). Same shape and scale
    * argument (map-side explode over stride starts, no shuffle).
    */
  def tokenIdChunks(df: DataFrame, idCol: String, textCol: String,
                    vocab: Vocab, chunkSize: Int = 64,
                    overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): got overlap=$overlap chunkSize=$chunkSize")
    val stride = chunkSize - overlap
    df.select(col(idCol).as("id"),
        encode(TextAnalysis.normalized(col(textCol)), vocab).as("ids"))
      .withColumn("s",
        explode(sequence(lit(0), greatest(size(col("ids")) - 1, lit(0)), lit(stride))))
      .select(col("id"),
        (col("s") / stride).cast("int").as("chunk_idx"),
        slice(col("ids"), col("s") + 1, lit(chunkSize)).as("ids"))
      .withColumn("n_tokens", size(col("ids")))
  }
}

/** Per-row greedy longest-match tokenizer kernel shared by the
  * interpreted and codegen paths of [[BpeEncodeExpr]]. The trie is
  * plain parallel arrays over sorted (firstChar, piece) buckets — built
  * once per executor (the expression ships only the piece strings) and
  * immutable afterwards, so tasks share it without locking.
  *
  * Matching walks the candidate pieces bucketed by first character in
  * DESCENDING length order and takes the first full match — greedy
  * longest-match with at most |bucket| substring probes per position.
  * Buckets are tiny for real vocabularies (pieces starting with a given
  * char), so this beats a pointer-chasing trie on cache behavior while
  * keeping the same O(position · bucket) bound.
  */
final class BpeCodec(pieces: IndexedSeq[String]) extends Serializable {

  // pieces bucketed by first char, longest first; id = vocab index + 1
  @transient private lazy val buckets: java.util.HashMap[Character, Array[(String, Int)]] = {
    val m = new java.util.HashMap[Character, scala.collection.mutable.ArrayBuffer[(String, Int)]]()
    pieces.zipWithIndex.foreach { case (p, i) =>
      m.computeIfAbsent(p.charAt(0), _ => scala.collection.mutable.ArrayBuffer.empty)
        .append((p, i + 1))
    }
    val out = new java.util.HashMap[Character, Array[(String, Int)]]()
    m.forEach((c, buf) => out.put(c, buf.sortBy { case (p, id) => (-p.length, id) }.toArray))
    out
  }

  /** Encode one normalized text row: per space-separated word, greedy
    * longest-match; unmatched char → id 0, advance 1.
    */
  def encodeRow(text: UTF8String): ArrayData = {
    val s = text.toString
    val ids = new scala.collection.mutable.ArrayBuffer[Int](s.length / 2 + 1)
    var w = 0
    val n = s.length
    while (w < n) {
      if (s.charAt(w) == ' ') w += 1
      else {
        // word = [w, e)
        var e = w
        while (e < n && s.charAt(e) != ' ') e += 1
        var pos = w
        while (pos < e) {
          val cand = buckets.get(s.charAt(pos))
          var matched = 0 // piece length consumed; 0 = no match yet
          var id = 0
          if (cand != null) {
            var i = 0
            while (matched == 0 && i < cand.length) {
              val (p, pid) = cand(i)
              // piece must fit inside the WORD (never across the space)
              if (pos + p.length <= e && s.startsWith(p, pos)) {
                matched = p.length; id = pid
              }
              i += 1
            }
          }
          if (matched == 0) { ids += 0; pos += 1 } // <unk>
          else { ids += id; pos += matched }
        }
        w = e
      }
    }
    new GenericArrayData(ids.toArray)
  }
}

/** Native expression applying a [[Bpe.Vocab]] by greedy longest-match:
  * `string → array<int>` (token ids; 0 = `<unk>`). Why a custom
  * expression: the per-position variable-length matching loop has no
  * Column-algebra form that stays inside whole-stage codegen (a
  * `transform`/`aggregate` encoding would interpret a lambda per
  * character), and a Scala UDF would break the repo's zero-UDF rule and
  * codegen fusion. The codegen path calls the same [[BpeCodec]] kernel
  * via a plan reference object — one virtual call per row, vocab built
  * once per executor.
  */
case class BpeEncodeExpr(child: Expression, pieces: IndexedSeq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val codec = new BpeCodec(pieces)

  override protected def nullSafeEval(input: Any): Any =
    codec.encodeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codecRef = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $codecRef.encodeRow($in);")
  }

  override def prettyName: String = "bpe_encode"

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
