package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing UDTF — the third production Generator, and q176's
  * hot loop. Emits each document's DISTINCT selected fingerprints:
  * the minimum 60-bit md5 gram hash of every complete w-window over
  * the positional n-gram stream (the MOSS selection rule).
  *
  * Identical selection to the composable form (positional posexplode
  * → `min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS w−1
  * PRECEDING)` → distinct), spec-asserted — but the window pass that
  * form needs is a doc_id Exchange + per-partition SORT of every
  * gram row; here selection happens INSIDE the generator on the
  * already-ordered token array, so the operator needs no shuffle at
  * all before the cross-document pair join, and only (doc_id,
  * fingerprint) rows ever leave the scan stage. Documents with fewer
  * than n+w−1 tokens have no complete window and emit nothing, as
  * before.
  */
case class WinnowGenerator(child: Expression, n: Int, w: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1 && w >= 1, "gram width and window must be >= 1")

  override def elementSchema: StructType =
    new StructType().add("fp", LongType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow requires a string column, got ${child.dataType.catalogString}")

  private def StringType0 = org.apache.spark.sql.types.StringType

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
    val m = toks.length
    val nGrams = m - n + 1
    if (nGrams < w) return Iterator.empty
    val md = MessageDigest.getInstance("MD5")
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val gram = UTF8String.concatWs(sep,
        java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      md.reset()
      h(i) = top60(md.digest(gram.getBytes))
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    var pos = w - 1
    while (pos < nGrams) {
      var mn = h(pos - w + 1)
      var j = pos - w + 2
      while (j <= pos) { if (h(j) < mn) mn = h(j); j += 1 }
      selected.add(mn)
      pos += 1
    }
    val it = selected.iterator()
    new Iterator[InternalRow] {
      def hasNext: Boolean = it.hasNext
      def next(): InternalRow = InternalRow(it.next().longValue())
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowGenerator =
    copy(child = newChild)
}

object WinnowGenerator {
  /** Column-API entry:
    * `df.select(col("doc_id"), winnowed(col("text"), 3, 4).as("fp"))`. */
  def winnowed(text: Column, n: Int, w: Int): Column =
    ColumnBridge.column(WinnowGenerator(ColumnBridge.expression(text), n, w))
}
