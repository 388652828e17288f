package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.apps.{OccupancyEda, OccupancyEtl}
import graft.ml.OccupancyMl

/** ML + facade parity: weighted LR / RF-CV flows on a synthetic
  * occupancy-like dataset (metric floors, not equality — RNG differs
  * from the reference's Python seeds), plus the merge/dedup/re-id ETL
  * and EDA facades. When the reference dataset files are present the
  * published golden facts are asserted exactly (BASELINE.md: 20,560
  * rows, 0 nulls, 23.1% positive, dedup removes 0).
  */
class OccupancySpec extends AnyFunSuite {
  import SparkTestSession.spark

  /** Deterministic occupancy-like data: Light is strongly predictive
    * (as in the real dataset, corr ≈ 0.91), others weakly.
    */
  private lazy val synthetic: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = (1 to 4000).map { i =>
      val occupied = rng.nextDouble() < 0.25
      val light = if (occupied) 300.0 + rng.nextDouble() * 400 else rng.nextDouble() * 250
      val co2 = if (occupied) 700.0 + rng.nextDouble() * 800 else 400.0 + rng.nextDouble() * 300
      val temp = 20.0 + rng.nextDouble() * 3 + (if (occupied) 0.5 else 0.0)
      val hum = 25.0 + rng.nextDouble() * 5
      val hr = 0.003 + rng.nextDouble() * 0.002
      (i, f"2015-02-${4 + i % 10}%02d 10:${i % 60}%02d:00", temp, hum, light, co2, hr,
        if (occupied) 1 else 0)
    }
    rows.toDF("id", "date", "Temperature", "Humidity", "Light", "CO2", "HumidityRatio", "Occupancy")
      .withColumn("datetime", col("date").cast("timestamp"))
      .withColumn("label", col("Occupancy"))
  }

  test("class weights follow w_i = total/(2*n_i) (R3)") {
    val weighted = OccupancyMl.withClassWeights(synthetic).cache()
    val counts = synthetic.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val w = weighted.select("label", "classWeight").distinct().collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(w(0) - total / (2 * counts(0))) < 1e-9)
    assert(math.abs(w(1) - total / (2 * counts(1))) < 1e-9)
    // minority upweighted
    assert(w(1) > w(0))
  }

  test("oversampling approaches class parity (R2)") {
    val balanced = OccupancyMl.oversampleMinority(synthetic)
    val counts = balanced.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ratio = counts(1).toDouble / counts(0)
    assert(ratio > 0.8 && ratio < 1.2)
  }

  test("weighted LR pipeline trains, persists, reloads, and clears the accuracy floor (M1-M6, K4, S3)") {
    val data = OccupancyMl.withClassWeights(
      synthetic.withColumn("label", col("label").cast("double")))
    val Array(train, test) = data.randomSplit(Array(0.7, 0.3), 42L)
    val model = OccupancyMl.weightedLrPipeline().fit(train)

    val dir = java.nio.file.Files.createTempDirectory("graft-lr").toString + "/model"
    model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.PipelineModel.load(dir)

    val pred = reloaded.transform(test).cache()
    val metrics = OccupancyMl.evaluate(pred)
    assert(metrics("accuracy") > 0.95, s"accuracy ${metrics("accuracy")}")
    assert(metrics("areaUnderROC") > 0.97, s"auc ${metrics("areaUnderROC")}")
    assert(metrics("f1") > 0.95)

    val cm = OccupancyMl.confusionMatrix(pred).collect()
    assert(cm.map(_.getLong(2)).sum == pred.count())
    assert(cm.length <= 4)

    val (roc, coefs) = OccupancyMl.lrSummary(model)
    assert(roc.count() > 0)
    // Light dominates, as in the reference's published coefficients
    assert(math.abs(coefs("Light")) == coefs.values.map(math.abs).max)
  }

  test("RF + CrossValidator selects a model above the AUC floor (M4, M7, M8, M10)") {
    val data = OccupancyMl.oversampleMinority(
        synthetic.withColumn("label", col("label").cast("double")))
      .filter(col("label").isNotNull)
    val Array(train, test) = data.randomSplit(Array(0.8, 0.2), 42L)
    val cv = OccupancyMl.rfCvPipeline().fit(train)
    val pred = cv.transform(test)
    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC").evaluate(pred)
    assert(auc > 0.97, s"auc $auc")
    val best = cv.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
    val rf = best.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.RandomForestClassificationModel]
    val importances = rf.featureImportances.toArray
    assert(importances.length == 4 && math.abs(importances.sum - 1.0) < 1e-6)
  }

  test("ETL merge/dedup/re-id: duplicates across sets collapse, ids contiguous (U1, U4, W2)") {
    import spark.implicits._
    def slice(ids: Range, tag: String) =
      synthetic.filter(col("id").isin(ids: _*)).drop("datetime", "label")
        .withColumn("set_name", lit(tag))
        .withColumn("datetime", col("date").cast("timestamp"))
    // overlap 900..1000 appears in both "train" and "test"
    val merged = OccupancyEtl.mergeAndDeduplicate(Seq(
      slice(1 to 1000, "train"), slice(900 to 1500, "test")))
    assert(merged.count() == 1500)
    val ids = merged.select("id").as[Int].collect()
    assert(ids.min == 1 && ids.max == 1500 && ids.distinct.length == 1500)
    assert(merged.columns.head == "id")
  }

  test("EDA facade sections produce sane shapes on synthetic data") {
    val all = synthetic.drop("label")
    assert(OccupancyEda.numericCols(all) ==
      Seq("Temperature", "Humidity", "Light", "CO2", "HumidityRatio"))
    val dist = OccupancyEda.occupancyDistribution(all).collect()
    assert(dist.map(_.getLong(1)).sum == all.count())
    assert(math.abs(dist.map(_.getDouble(2)).sum - 100.0) < 0.05)
    val corr = OccupancyEda.labelCorrelations(all)
    assert(corr("Light") > 0.8) // Light is the dominant signal
    val rules = OccupancyEda.simpleRules(all).collect()
    assert(rules.length == 3)
    val lightRule = rules.find(_.getString(0) == "light_gt").get.getDouble(1)
    val bothLe = rules.find(_.getString(0) == "both_le").get.getDouble(1)
    assert(lightRule > 0.9 && bothLe < 0.1)
    val hours = OccupancyEda.hourlyPattern(all).collect()
    assert(hours.map(_.getLong(1)).sum == all.count())
  }

  // --- golden parity against the reference's published dataset facts,
  // only when the reference tree is present (read-only fixture) ---
  private val refDir = "/root/reference/eda/dataset"

  test("reference-dataset golden facts: 20,560 rows, 0 nulls, 23.1% positive, dedup removes 0") {
    assume(new java.io.File(s"$refDir/datatraining.txt").isFile, "reference dataset not present")
    val dfs = Seq("datatraining.txt" -> "train", "datatest.txt" -> "test", "datatest2.txt" -> "test2")
      .map { case (f, tag) => OccupancyEtl.loadOccupancyFile(spark, s"$refDir/$f", tag) }
    val union = dfs.reduce(_ unionByName _)
    assert(union.count() == 20560)

    val merged = OccupancyEtl.mergeAndDeduplicate(dfs)
    assert(merged.count() == 20560) // the three files are disjoint

    val nulls = OccupancyEda.missingValues(merged.drop("id")).head().toSeq.map(_.asInstanceOf[Long])
    assert(nulls.forall(_ == 0L))

    val dist = OccupancyEda.occupancyDistribution(merged).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(dist(1) - 23.1) < 0.1)

    val all = merged.withColumn("datetime", col("date").cast("timestamp"))
    val corrLight = OccupancyEda.labelCorrelations(all)("Light")
    assert(corrLight > 0.89 && corrLight < 0.93) // published ≈ 0.91
  }

  test("reference-dataset LR parity: accuracy/F1 clear the published floors (BASELINE.md)") {
    assume(new java.io.File(s"$refDir/datatraining.txt").isFile, "reference dataset not present")
    // the reference's load path (rename → cast → na.drop, F7/P4) over all three files
    val merged = Seq("datatraining.txt", "datatest.txt", "datatest2.txt")
      .map(f => OccupancyMl.loadOccupancy(spark, s"$refDir/$f"))
      .reduce(_ unionByName _)
    assert(merged.count() == 20560) // na.drop removes nothing (0 nulls)
    val weighted = OccupancyMl.withClassWeights(merged)
    // reference protocol: 70/30 split seed 42 (ml/train_model.py:347)
    val Array(train, test) = weighted.randomSplit(Array(0.7, 0.3), 42L)
    val model = OccupancyMl.weightedLrPipeline().fit(train)
    val metrics = OccupancyMl.evaluate(model.transform(test))
    // published: accuracy 0.9822, F1 0.9824 (exact seed differs across
    // Scala/Python RNGs → assert floors per SURVEY §7)
    assert(metrics("accuracy") > 0.97, s"accuracy ${metrics("accuracy")}")
    assert(metrics("f1") > 0.97, s"f1 ${metrics("f1")}")
    assert(metrics("areaUnderROC") > 0.98, s"auc ${metrics("areaUnderROC")}")
    // published coefficient ORDERING: Light dominates, CO2 second
    // (ml/reports/lr_coefficients.csv)
    val (_, coefs) = OccupancyMl.lrSummary(model)
    val ranked = coefs.toSeq.sortBy { case (_, v) => -math.abs(v) }.map(_._1)
    assert(ranked.head == "Light", s"ranking $ranked")
  }

  test("reference-dataset RF (no-Light) parity: AUC clears the published 0.99 floor") {
    assume(new java.io.File(s"$refDir/datatraining.txt").isFile, "reference dataset not present")
    // notebook protocol: no Light feature, minority oversampled to
    // parity, 80/20 split (published test AUC 0.9975 / accuracy 0.9783)
    val merged = Seq("datatraining.txt", "datatest.txt", "datatest2.txt")
      .map(f => OccupancyMl.loadOccupancy(spark, s"$refDir/$f"))
      .reduce(_ unionByName _)
    val Array(train, test) = merged.randomSplit(Array(0.8, 0.2), 42L)
    val balanced = OccupancyMl.oversampleMinority(train)
    val features = OccupancyMl.featureCols.filterNot(_ == "Light")
    val pipeline = new org.apache.spark.ml.Pipeline().setStages(Array(
      new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(features).setOutputCol("features_raw"),
      new org.apache.spark.ml.feature.StandardScaler()
        .setInputCol("features_raw").setOutputCol("features")
        .setWithStd(true).setWithMean(true),
      new org.apache.spark.ml.classification.RandomForestClassifier()
        .setNumTrees(100).setMaxDepth(15).setSubsamplingRate(0.8).setSeed(42L)))
    val model = pipeline.fit(balanced)
    val metrics = OccupancyMl.evaluate(model.transform(test))
    assert(metrics("areaUnderROC") > 0.99, s"auc ${metrics("areaUnderROC")}")
    assert(metrics("accuracy") > 0.97, s"accuracy ${metrics("accuracy")}")
  }
}
