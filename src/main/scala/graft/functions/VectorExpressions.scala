package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable form (`zip_with` + `aggregate`) materializes an
  * intermediate product array per row and walks it with per-element
  * lambda dispatch; at 100 TB of 64-d embeddings that's the dominant
  * cost of similarity search. These expressions fuse the walk into one
  * codegen'd loop — no allocation, no virtual calls — while keeping
  * ACCUMULATION ORDER identical to the sequential left fold, so
  * results are bit-for-bit the same as the composable form (and as
  * DuckDB's list_dot_product oracle).
  *
  * Null elements inside the arrays are not expected (embeddings are
  * dense); a null array input yields null via the standard
  * BinaryExpression null-propagation.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused one-pass cosine similarity: dot, |a|², |b|² accumulated in a
  * single loop; result = dot / (√na · √nb), exactly the arithmetic of
  * the composable three-fold form.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API + registration hooks. */
object VectorFunctions {

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Extract a compile-time Int argument (the native generators take
    * their widths/dims as constructor constants, not runtime
    * columns). */
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(n: Int,
        org.apache.spark.sql.types.IntegerType) => n
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Extract a literal string-array argument (subword vocabularies). */
  private def strArrayLit(e: Expression, what: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
      items.map {
        case org.apache.spark.sql.catalyst.expressions.Literal(s, org.apache.spark.sql.types.StringType)
          if s != null => s.toString
        case other => throw new IllegalArgumentException(
          s"$what entries must be string literals, got $other")
      }
    case org.apache.spark.sql.catalyst.expressions.Literal(
        arr: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _)) =>
      arr.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"$what must be a literal array of strings, got $other")
  }

  private[graft] val registry: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", classOf[DotProduct].getName, (e: Seq[Expression]) => DotProduct(e(0), e(1))),
    ("cosine_sim", classOf[CosineSimilarity].getName, (e: Seq[Expression]) => CosineSimilarity(e(0), e(1))),
    ("shingles", classOf[ShingleGenerator].getName, (e: Seq[Expression]) =>
      ShingleGenerator(e(0), intLit(e(1), "shingles(text, n): n"))),
    // the full native-generator surface, SQL-callable (the complete
    // API story: every Column-API UDTF reachable from spark.sql too)
    ("cdc_chunks", classOf[ChunkGenerator].getName, (e: Seq[Expression]) =>
      ChunkGenerator(e(0), intLit(e(1), "cdc_chunks n"), intLit(e(2), "cdc_chunks divisor"))),
    ("winnowed", classOf[WinnowGenerator].getName, (e: Seq[Expression]) =>
      WinnowGenerator(e(0), intLit(e(1), "winnowed n"), intLit(e(2), "winnowed w"))),
    ("gram_hashes", classOf[GramHashGenerator].getName, (e: Seq[Expression]) =>
      GramHashGenerator(e(0), intLit(e(1), "gram_hashes n"))),
    ("char_grams", classOf[CharGramGenerator].getName, (e: Seq[Expression]) =>
      CharGramGenerator(e(0), intLit(e(1), "char_grams n"))),
    ("sign_project", classOf[SignProjectGenerator].getName, (e: Seq[Expression]) =>
      SignProjectGenerator(e(0), intLit(e(1), "sign_project outDim"),
        intLit(e(2), "sign_project maxInputDim"))),
    ("subwords", classOf[SubwordGenerator].getName, (e: Seq[Expression]) =>
      SubwordGenerator(e(0),
        if (e.length > 1) strArrayLit(e(1), "subwords vocab")
        else SubwordGenerator.DefaultVocab)))

  /** Make every native function/UDTF callable from SQL in a live session. */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (name, cls, builder) =>
      ColumnBridge.registerFunction(spark, name, cls, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * native functions at session build time (SparkSessionExtensions —
  * the deployment path; [[VectorFunctions.register]] is the runtime
  * path for existing sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.registry.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name), new ExpressionInfo(cls, name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
  }
}
