package graft

import java.sql.Timestamp

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamPipeline

/** The reference's full streaming-inference contract
  * (infrastructure/stream_inference.py:45-181 + the E2E harness
  * test_stream_interfaces.py:34-111): a trained PipelineModel applied
  * to a stream of JSON requests, with all five payload classes —
  * valid / missing_field / null_field / wrong_type / broken_payload —
  * routed to either a real prediction or the sentinel
  * (prediction=-1, probability=-1.0).
  */
class StreamInferenceSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** Request schema, fixed/declared (stream_inference.py:28-42). */
  private val requestSchema = new StructType()
    .add("request_id", StringType)
    .add("payload", new StructType()
      .add("Temperature", DoubleType)
      .add("Humidity", DoubleType)
      .add("Light", DoubleType)
      .add("CO2", DoubleType))

  private val featureCols = Seq("Temperature", "Humidity", "Light", "CO2")

  /** Five payload classes from test_stream_interfaces.py:105-111. */
  private val requests = Seq(
    ("valid", """{"request_id":"r-valid","payload":{"Temperature":23.1,"Humidity":27.2,"Light":420.0,"CO2":780.0}}"""),
    ("missing_field", """{"request_id":"r-missing","payload":{"Temperature":23.1,"Humidity":27.2,"CO2":780.0}}"""),
    ("null_field", """{"request_id":"r-null","payload":{"Temperature":23.1,"Humidity":null,"Light":420.0,"CO2":780.0}}"""),
    ("wrong_type", """{"request_id":"r-wrongtype","payload":{"Temperature":"23.1c","Humidity":27.2,"Light":420.0,"CO2":780.0}}"""),
    ("broken_payload", """not a json at all""")
  )

  /** Train a tiny occupancy-style model (Light drives the label). */
  private def trainModel() = {
    val rng = new scala.util.Random(7)
    val train = (1 to 800).map { _ =>
      val occ = rng.nextBoolean()
      val light = if (occ) 300 + rng.nextDouble() * 300 else rng.nextDouble() * 250
      (20 + rng.nextDouble() * 3, 25 + rng.nextDouble() * 5, light,
        500 + rng.nextDouble() * 500, if (occ) 1.0 else 0.0)
    }.toDF("Temperature", "Humidity", "Light", "CO2", "label")
    new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(featureCols.toArray).setOutputCol("features_raw"),
      new StandardScaler().setInputCol("features_raw").setOutputCol("features"),
      new LogisticRegression().setMaxIter(20))).fit(train)
  }

  /** The reference's streaming graph: parse → flatten → validity split
    * → model on the valid branch → sentinel on the invalid → union
    * (stream_inference.py:62-129). Works identically on batch and
    * streaming frames.
    */
  private def inferenceGraph(model: org.apache.spark.ml.PipelineModel, raw: DataFrame): DataFrame = {
    val flatCols = col("data.request_id").as("request_id") +:
      featureCols.map(c => col(s"data.payload.$c").as(c))
    val parsed = raw
      .withColumn("data", from_json(col("value"), requestSchema))
      .select(flatCols: _*)
    val flagged = parsed.withColumn("is_valid",
      col("request_id").isNotNull +: featureCols.map(col(_).isNotNull) reduce (_ && _))
    val valid = model.transform(flagged.filter("is_valid").drop("is_valid"))
      .withColumn("probability_arr", vector_to_array(col("probability")))
      .select(col("request_id"),
        col("prediction").cast("int").as("prediction"),
        round(col("probability_arr")(1), 4).as("probability"))
    val invalid = flagged.filter("NOT is_valid")
      .select(col("request_id"),
        lit(-1).as("prediction"), lit(-1.0).as("probability"))
    valid.unionByName(invalid)
  }

  test("stream→model inference routes all five payload classes per the contract") {
    val model = trainModel()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val stream = mem.toDF().toDF("value")

    val query = StreamPipeline.appendSink(
      inferenceGraph(model, stream), format = "memory",
      checkpointDir = java.nio.file.Files.createTempDirectory("graft-infer").toString,
      queryName = "inference_mem").start()
    try {
      mem.addData(requests.map(_._2): _*)
      query.processAllAvailable()
      val out = spark.table("inference_mem").collect()
        .map(r => Option(r.getString(0)).getOrElse("__null__") ->
          (r.getInt(1), r.getDouble(2))).toMap

      // valid → real prediction with probability in [0,1]; Light=420 → occupied
      val (pred, prob) = out("r-valid")
      assert(pred == 1, s"expected occupied, got $pred")
      assert(prob >= 0.0 && prob <= 1.0)
      // every invalid class → sentinel -1 / -1.0 (from_json null-fills
      // missing/null/wrong-type; broken JSON nulls the whole struct)
      assert(out("r-missing") == (-1, -1.0))
      assert(out("r-null") == (-1, -1.0))
      assert(out("r-wrongtype") == (-1, -1.0))
      assert(out("__null__") == (-1, -1.0)) // broken payload: request_id itself null
      assert(out.size == 5)
    } finally query.stop()
  }

  test("the same inference graph gives identical answers in batch mode") {
    val model = trainModel()
    val batch = inferenceGraph(model, requests.map(_._2).toDF("value")).collect()
    assert(batch.length == 5)
    assert(batch.count(_.getInt(1) == -1) == 4)
  }
}
