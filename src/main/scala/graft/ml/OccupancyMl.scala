package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib pipeline surface (SURVEY.md §2.12), re-expressing the
  * reference's two training flows:
  *
  *  - weighted Logistic Regression (ml/train_model.py:119-371):
  *    load → cast → na.drop → class weights w_i = total/(2·n_i) →
  *    randomSplit → VectorAssembler → StandardScaler(std only) → LR →
  *    evaluators → confusion matrix → save;
  *  - RandomForest with oversampling + CrossValidator
  *    (ml/model_creation_and_tuning.ipynb): minority class sampled
  *    with replacement to parity, scaler with mean+std, 3-fold CV
  *    over a small grid.
  *
  * Metric parity is asserted as floors (accuracy/AUC thresholds), not
  * equality — Scala vs Python RNG seeds differ (SURVEY.md §7).
  */
object OccupancyMl {

  val featureCols: Array[String] =
    Array("Temperature", "Humidity", "Light", "CO2", "HumidityRatio")

  /** The reference's load_data path (ml/train_model.py:119-147): CSV
    * scan → label rename (P4) → defensive casts → na.drop on
    * features+label (F7).
    */
  def loadOccupancy(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    graft.engine.Tables.csv(spark, path, Some(graft.engine.Tables.occupancySchema))
      .withColumnRenamed("Occupancy", "label")
      .withColumn("label", col("label").cast("double"))
      .na.drop((featureCols :+ "label").toSeq)

  /** Class-weight computation, reference formula w_i = total / (2·n_i)
    * (ml/train_model.py:150-175): one grouped count collected to the
    * driver (two rows), then a when/otherwise weight column.
    */
  def withClassWeights(df: DataFrame, labelCol: String = "label"): DataFrame = {
    val counts = df.groupBy(labelCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Number](0).intValue() -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val w0 = total / (2.0 * counts.getOrElse(0, 1L))
    val w1 = total / (2.0 * counts.getOrElse(1, 1L))
    df.withColumn("classWeight",
      when(col(labelCol) === 0, lit(w0)).otherwise(lit(w1)))
  }

  /** Minority oversampling with replacement to class parity
    * (notebook cell 2e3922dd59cc83d): ratio = majority/minority.
    */
  def oversampleMinority(df: DataFrame, labelCol: String = "label", seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(labelCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Number](0).intValue() -> r.getLong(1)).toMap
    val (major, minor) = if (counts.getOrElse(0, 0L) >= counts.getOrElse(1, 0L)) (0, 1) else (1, 0)
    val ratio = counts(major).toDouble / counts(minor).toDouble
    val majorDf = df.filter(col(labelCol) === major)
    val minorDf = df.filter(col(labelCol) === minor)
    majorDf.union(minorDf.sample(withReplacement = true, ratio, seed))
  }

  /** Assemble → scale(std) → weighted LR, reference hyper-parameters
    * (ml/train_model.py:179-200: maxIter=50, regParam=0.01,
    * elasticNet=0, weightCol).
    */
  def weightedLrPipeline(features: Array[String] = featureCols): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(features).setOutputCol("features_raw")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithStd(true).setWithMean(false)
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setElasticNetParam(0.0)
      .setWeightCol("classWeight")
    new Pipeline().setStages(Array(assembler, scaler, lr))
  }

  /** Assemble(no Light) → scale(mean+std) → RF inside a 3-fold
    * CrossValidator (notebook flow; grid kept small so tests stay
    * fast — the reference's best params were numTrees=200/maxDepth=25).
    */
  def rfCvPipeline(features: Array[String] = featureCols.filterNot(_ == "Light")): CrossValidator = {
    val assembler = new VectorAssembler()
      .setInputCols(features).setOutputCol("features_raw")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithStd(true).setWithMean(true)
    val rf = new RandomForestClassifier().setSeed(42L)
    val pipeline = new Pipeline().setStages(Array(assembler, scaler, rf))
    val grid = new ParamGridBuilder()
      .addGrid(rf.numTrees, Array(20, 50))
      .addGrid(rf.maxDepth, Array(5, 10))
      .build()
    new CrossValidator()
      .setEstimator(pipeline)
      .setEvaluator(new BinaryClassificationEvaluator().setMetricName("areaUnderROC"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(3)
      .setSeed(42L)
  }

  /** M6/M7 metrics, reference list (ml/train_model.py:207-231). */
  def evaluate(predictions: DataFrame): Map[String, Double] = {
    val metrics = Seq("accuracy", "f1", "weightedPrecision", "weightedRecall")
    val mc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
    val base = metrics.map(m => m -> mc.setMetricName(m).evaluate(predictions)).toMap
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setMetricName("areaUnderROC").evaluate(predictions)
    base + ("areaUnderROC" -> auc)
  }

  /** A10: confusion matrix as a grouped count (ml/train_model.py:239-243). */
  def confusionMatrix(predictions: DataFrame): DataFrame =
    predictions.groupBy("label", "prediction")
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")

  /** M9: LR training-summary export (ROC points + coefficients),
    * ml/train_model.py:283-309.
    */
  def lrSummary(model: PipelineModel, features: Array[String] = featureCols): (DataFrame, Map[String, Double]) = {
    val lrModel = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    val roc = lrModel.binarySummary.roc
    val coefs = features.zip(lrModel.coefficients.toArray).toMap
    (roc, coefs)
  }
}
