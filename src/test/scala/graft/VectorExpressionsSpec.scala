package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.functions.{GraftExtensions, VectorFunctions}
import graft.operators.Similarity

/** Native Catalyst vector expressions: bit-parity with the
  * higher-order-function form, codegen operation, and SQL
  * registration via both the runtime registry and
  * SparkSessionExtensions.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val vecs = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .cache()

  test("native dot/cosine are bit-identical to the zip_with/aggregate fold") {
    val both = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(
        Similarity.dot(col("a.v"), col("b.v")).as("dot_native"),
        Similarity.dotHof(col("a.v"), col("b.v")).as("dot_hof"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos_native"),
        Similarity.cosineHof(col("a.v"), col("b.v")).as("cos_hof"))
    val mismatches = both
      .filter(col("dot_native") =!= col("dot_hof") || col("cos_native") =!= col("cos_hof"))
      .count()
    assert(mismatches == 0)
  }

  test("known values: cosine of identical = 1, orthogonal = 0") {
    val df = spark.sql(
      "SELECT array(1.0d, 2.0d, 3.0d) AS a, array(1.0d, 2.0d, 3.0d) AS b, array(0.0d, 0.0d, 1.0d) AS c, array(0.0d, 1.0d, 0.0d) AS d")
    val r = df.select(
      VectorFunctions.cosineSim(col("a"), col("b")),
      VectorFunctions.cosineSim(col("c"), col("d")),
      VectorFunctions.dotProduct(col("a"), col("b"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 14.0)
  }

  test("null array propagates null") {
    val r = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a, array(1.0d) AS b")
      .select(VectorFunctions.cosineSim(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("expressions are SQL-callable after runtime registration") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 1.0d)) AS c, dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head()
    assert(math.abs(r.getDouble(0) - math.sqrt(0.5)) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    // the shingle UDTF generates rows straight from SQL, like explode
    val sh = spark.sql("SELECT shingles('a b c d', 3) AS shingle")
      .collect().map(_.getString(0)).toSeq
    assert(sh == Seq("a b c", "b c d"))
  }

  test("every native generator is SQL-callable: cdc_chunks, winnowed, gram_hashes, char_grams, sign_project, subwords") {
    VectorFunctions.register(spark)
    // each call mirrors a Column-API result exactly
    val chunks = spark.sql("SELECT cdc_chunks('a b c d e f g h', 3, 8)")
      .count()
    assert(chunks >= 1)
    val winnow = spark.sql("SELECT winnowed('a b c d e f g h i j', 3, 4) AS fp").count()
    val winnowDf = spark.range(1)
      .select(graft.functions.WinnowGenerator.winnowed(lit("a b c d e f g h i j"), 3, 4))
      .count()
    assert(winnow == winnowDf && winnow >= 1)
    assert(spark.sql("SELECT gram_hashes('a b c d', 2)").count() == 3)
    assert(spark.sql("SELECT char_grams('abcd', 2)").count() == 3)
    val rp = spark.sql("SELECT sign_project(array(1.0d, 2.0d), 4, 8)").count()
    assert(rp == 4)
    // subwords: default vocab (1-arg) and an explicit literal vocab
    val sw = spark.sql(
        "SELECT subwords('tablex', array('table', 'ta')) AS (word_idx, sub_idx, token, is_unk)")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(sw.toSeq == Seq((0, "table", 0), (1, "x", 1)), sw.mkString(";"))
    assert(spark.sql("SELECT subwords('the data')").count() == 2)
  }

  test("GraftExtensions injects both functions at builder time") {
    var injected = List.empty[String]
    val ext = new org.apache.spark.sql.SparkSessionExtensions {
      override def injectFunction(fd: (org.apache.spark.sql.catalyst.FunctionIdentifier,
          org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
          Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)): Unit = {
        injected ::= fd._1.funcName
        super.injectFunction(fd)
      }
    }
    new GraftExtensions().apply(ext)
    assert(injected.toSet == Set("dot_product", "cosine_sim", "shingles",
      "cdc_chunks", "winnowed", "gram_hashes", "char_grams", "sign_project",
      "subwords"))
  }

  test("embedding producers emit fixed-dim vectors (the norm-hoist precondition)") {
    // the three panel-cosine norm-hoist sites (Similarity
    // evalScoredPairs/evalScoredPairsFrames/decontamDropIds) are
    // bit-identical to the fused one-pass cosine ONLY when both
    // vectors have equal length: CosineSimilarity truncates to
    // min(numElements) while the hoisted √(v·v) runs over the full
    // vector. Pin the invariant on the real table so a variable-dim
    // embedding source fails here, not silently in the scores.
    val emb = graft.engine.Tables.embeddings(
      SparkTestSession.spark, SparkTestSession.sfDir)
    val dims = emb.select(size(col("embedding")).as("d")).distinct().collect()
    assert(dims.length == 1, s"variable embedding dims: ${dims.toSeq}")
  }

  test("whole-stage codegen survives the native expression (no interpreted fallback)") {
    val df = vecs.as("a").crossJoin(broadcast(vecs.as("b").limit(4)))
      .select(Similarity.cosine(col("a.v"), col("b.v")).as("c"))
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen span in the tree string
    assert("""\*\(\d+\) Project \[cosine_sim""".r.findFirstIn(plan).isDefined, plan)
  }
}
