package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking UDTF — the second production
  * Generator after [[ShingleGenerator]], and the q181 hot loop.
  *
  * Emits one (chunk_idx, chunk_text) row per content-defined chunk: a
  * boundary falls BEFORE token i (0-based, 1 ≤ i ≤ m−n) wherever the
  * first 60 bits of md5 of the n-token gram starting at i are ≡ 0 mod
  * `divisor`. Bit-for-bit the same rule as the composable form
  * (`conv(substring(md5(gram),1,15),16,10) % divisor`), so the DuckDB
  * oracle is unchanged — but evaluated in one native pass with a
  * reused MessageDigest instead of ~10 interpreted expression nodes
  * per gram inside a higher-order `filter` (the composable form
  * measured 17.6 s at 5 000 docs on 16 threads; this is the
  * Expression-beats-HOF rung of the extension ladder).
  *
  * Empty/short documents emit exactly one chunk (the whole text),
  * matching `split`'s [""] behavior in the composable form; null
  * text emits nothing.
  */
case class ChunkGenerator(child: Expression, n: Int, divisor: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "gram width must be >= 1")
  require(divisor >= 2, "divisor must be >= 2")

  override def elementSchema: StructType =
    new StructType()
      .add("chunk_idx", IntegerType, nullable = false)
      .add("chunk_text", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a string column, got ${child.dataType.catalogString}")

  private lazy val sep = UTF8String.fromString(" ")

  /** First 60 bits of the md5 digest as a non-negative long —
    * numerically identical to conv(substring(hex,1,15),16,10). */
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
    val starts = scala.collection.mutable.ArrayBuffer(0)
    if (m > n) {
      val md = MessageDigest.getInstance("MD5")
      var i = 1
      while (i <= m - n) {
        val gram = UTF8String.concatWs(sep,
          java.util.Arrays.copyOfRange(toks, i, i + n): _*)
        md.reset()
        if (top60(md.digest(gram.getBytes)) % divisor == 0) starts += i
        i += 1
      }
    }
    starts.indices.iterator.map { k =>
      val s = starts(k)
      val e = if (k + 1 < starts.length) starts(k + 1) else m
      InternalRow(k,
        UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, s, e): _*))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkGenerator =
    copy(child = newChild)
}

object ChunkGenerator {
  /** Column-API entry:
    * `df.select(col("doc_id"), cdcChunks(col("text"), 3, 8).as(Seq("chunk_idx", "chunk_text")))`. */
  def cdcChunks(text: Column, n: Int, divisor: Int): Column =
    ColumnBridge.column(ChunkGenerator(ColumnBridge.expression(text), n, divisor))
}
