package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-token shingle UDTF — the Generator tier of the custom
  * extension ladder (expression → generator → aggregator → rule →
  * strategy → physical exec), and the dedup cascade's hot inner loop.
  *
  * One row of n-token shingle text per window position, produced in a
  * single pass over the tokenized input. The composable equivalent —
  * `split` to an array column, `transform(sequence(...), i ->
  * concat_ws(slice(...)))`, then `explode` — materializes the token
  * array AND the full shingle array per row before the generator
  * emits anything; this produces each shingle lazily from the token
  * array alone (the iterator never holds more than one shingle), so
  * long documents cost O(tokens) transient memory instead of
  * O(tokens + shingle-bytes). Output is the identical multiset, so
  * swapping it into the cascade changes no oracle hash.
  *
  * Documents shorter than n tokens emit nothing (the cascade's
  * existing `len >= n` contract); null text emits nothing.
  */
case class ShingleGenerator(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires a string column, got ${child.dataType.catalogString}")

  private lazy val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    val toks = raw.asInstanceOf[UTF8String].split(sep, -1)
    if (toks.length < n) Iterator.empty
    else (0 to toks.length - n).iterator.map { i =>
      InternalRow(UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, i, i + n): _*))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}

object ShingleGenerator {
  /** Column-API entry: `df.select(col("doc_id"), shingles(col("text"), 3).as("shingle"))`. */
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleGenerator(ColumnBridge.expression(text), n))
}
