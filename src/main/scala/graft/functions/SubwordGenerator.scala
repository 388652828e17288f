package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native greedy subword segmentation UDTF — the tokenizer-shaped
  * operator of the LLM-pipeline surface: whitespace pre-tokenization
  * (the standard BPE/WordPiece front end), then left-to-right
  * MAXIMAL MUNCH against a fixed subword vocabulary inside each word
  * — at every position take the longest vocabulary entry matching
  * the remaining prefix, else emit the single character as an UNK
  * token. Emits one (word_idx, sub_idx, token, is_unk) row per
  * subword; empty words (consecutive spaces) emit nothing; null text
  * emits nothing.
  *
  * This is deliberately a FIXED-vocab segmenter, not a BPE merge
  * LEARNER: segmentation is a pure per-row function (embarrassingly
  * parallel, zero shuffle, one JVM loop per word — the
  * ChunkGenerator rung of the native-extension ladder), and the same
  * greedy recurrence is expressible as a DuckDB recursive CTE, so
  * per-document token counts, fertility, and UNK rates are
  * exact-oracle-checkable — a seeded BPE trainer would be rows-only.
  * Vocab fitness itself is measured downstream (fertility ≈ tokens
  * per word and UNK rate are exactly the two numbers a tokenizer
  * swap is judged by).
  *
  * Determinism: at a given position at most one vocabulary entry of
  * a given length can match (equal strings are equal), so "longest
  * match" is unique; the segmentation is a pure function of
  * (text, vocab).
  */
case class SubwordGenerator(child: Expression, vocab: Seq[String])
  extends UnaryExpression with Generator with CodegenFallback {

  require(vocab.nonEmpty, "vocab must be non-empty")
  require(vocab.distinct.length == vocab.length, "vocab entries must be unique")
  require(vocab.forall(_.nonEmpty), "vocab entries must be non-empty")

  override def elementSchema: StructType =
    new StructType()
      .add("word_idx", IntegerType, nullable = false)
      .add("sub_idx", IntegerType, nullable = false)
      .add("token", StringType, nullable = false)
      .add("is_unk", IntegerType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"subwords requires a string column, got ${child.dataType.catalogString}")

  private lazy val sep = UTF8String.fromString(" ")
  // longest-first, so the first prefix hit IS the maximal munch
  private lazy val byLenDesc: Array[String] = vocab.sortBy(v => (-v.length, v)).toArray

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    val words = raw.asInstanceOf[UTF8String].toString.split(' ')
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var wi = 0
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        var pos = 0
        var si = 0
        while (pos < word.length) {
          var matched: String = null
          var v = 0
          while (matched == null && v < byLenDesc.length) {
            val cand = byLenDesc(v)
            if (cand.length <= word.length - pos &&
                word.startsWith(cand, pos)) matched = cand
            v += 1
          }
          if (matched != null) {
            out += InternalRow(wi, si, UTF8String.fromString(matched), 0)
            pos += matched.length
          } else {
            out += InternalRow(wi, si,
              UTF8String.fromString(word.substring(pos, pos + 1)), 1)
            pos += 1
          }
          si += 1
        }
        wi += 1
      }
      w += 1
    }
    out.iterator
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordGenerator =
    copy(child = newChild)
}

object SubwordGenerator {

  /** The default segmentation vocabulary: the corpus's frequent whole
    * words plus two-character sub-units and single-character
    * fallbacks — rich enough that common text segments into multi-
    * character tokens while rare characters still surface as UNK
    * (the quantity the fertility/UNK audit exists to measure). One
    * source of truth for both engines: the DuckDB oracle inlines
    * exactly this list.
    */
  val DefaultVocab: Seq[String] = Seq(
    "the", "data", "table", "query", "window", "stream", "filter", "batch",
    "order", "value", "small", "spark", "merge", "customer", "column",
    "join", "hash", "scan", "sort", "line", "part", "row", "key", "agg",
    "big", "fast", "slow",
    "qu", "er", "ta", "ba", "st", "sl", "sm", "co", "da", "wi", "do", "ow",
    "an", "in", "ar",
    "a", "e", "s", "t", "w", "y", "g", "o", "r")

  /** Column-API entry:
    * `df.select(col("doc_id"), subwords(col("text")).as(Seq("word_idx", "sub_idx", "token", "is_unk")))`.
    */
  def subwords(text: Column, vocab: Seq[String] = DefaultVocab): Column =
    ColumnBridge.column(SubwordGenerator(ColumnBridge.expression(text), vocab))
}
