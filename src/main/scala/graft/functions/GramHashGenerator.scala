package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native positional gram-hash UDTF — one (pos, h) row per n-token
  * gram, h the 60-bit md5 key. The building block under the
  * position-aware gram family (shared-run forensics q183): the
  * composable form materializes the full gram-string array per
  * document inside an interpreted `transform` before posexplode ever
  * runs; this emits each hash straight off the token array. Same
  * 0-based positions, same hash, so every downstream oracle is
  * unchanged. Documents shorter than n tokens emit nothing; null
  * text emits nothing.
  */
case class GramHashGenerator(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "gram width must be >= 1")

  override def elementSchema: StructType =
    new StructType()
      .add("pos", IntegerType, nullable = false)
      .add("h", LongType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires a string column, got ${child.dataType.catalogString}")

  private lazy val sep = UTF8String.fromString(" ")

  private def top60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    val toks = raw.asInstanceOf[UTF8String].split(sep, -1)
    if (toks.length < n) return Iterator.empty
    val md = MessageDigest.getInstance("MD5")
    (0 to toks.length - n).iterator.map { i =>
      val gram = UTF8String.concatWs(sep,
        java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      md.reset()
      InternalRow(i, top60(md.digest(gram.getBytes)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashGenerator =
    copy(child = newChild)
}

object GramHashGenerator {
  /** Column-API entry:
    * `df.select(col("doc_id"), gramHashes(col("text"), 3).as(Seq("pos", "h")))`. */
  def gramHashes(text: Column, n: Int): Column =
    ColumnBridge.column(GramHashGenerator(ColumnBridge.expression(text), n))
}
