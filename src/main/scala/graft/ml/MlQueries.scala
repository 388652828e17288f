package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** ML demonstrations over the driver's testdata (SparkEntry-facing).
  * Model outputs are RNG-dependent, so these queries are rows-only in
  * the driver's correctness gate; metric floors live in ScalaTest.
  */
object MlQueries {

  /** Wall-clock of the LAST [[trainEvalConfusion]] `pipeline.fit`
    * (scaler fit + LBFGS passes) — the bench reads it after the run
    * and reports `q41_fit_sec` on the main line, so the recurring
    * "q41 slow" flag splits into fit-side (treeAggregate passes under
    * load) vs score-side (the full-test-split transform) instead of
    * being argued from totals. -1 until a fit has run; written only
    * from the single-threaded query loop.
    */
  @volatile private[graft] var lastFitSec: Double = -1.0

  /** R1+M1+M2+M3+M5+A10 end-to-end: assemble/scale/LR over lineitem,
    * predicting high-quantity lines from price attributes, evaluated
    * as a confusion matrix. This runs inside the per-round bench, and
    * its result is rows-only (RNG-dependent) — so the FIT cost is
    * bounded: the training side is capped at `maxTrainRows` via a
    * seeded sample (the LBFGS pass count times the training-set scan
    * is the only unbounded term in the query; the model-quality floors
    * for the full M1-M10 surface are proven on the reference dataset
    * in OccupancySpec, where nothing is capped). Evaluation still
    * scores the FULL test split.
    */
  def trainEvalConfusion(spark: SparkSession, dir: String,
                         maxTrainRows: Long = 50000L): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val data = li.select(
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      (col("l_quantity") > lit(25.0)).cast("double").as("label"))
    val Array(trainFull, test) = data.randomSplit(Array(0.7, 0.3), 42L)
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler()
        .setInputCols(Array("l_extendedprice", "l_discount", "l_tax"))
        .setOutputCol("features_raw"),
      new StandardScaler()
        .setInputCol("features_raw").setOutputCol("features")
        .setWithStd(true).setWithMean(false),
      // 3 iterations / 50k rows: the entry is a rows-only operator
      // demonstration (M1-M10 quality floors are proven uncapped in
      // OccupancySpec), so the fit cost is bounded as tightly as the
      // demonstration allows — each LBFGS iteration is a full
      // treeAggregate pass over the cached training sample
      new LogisticRegression().setMaxIter(3).setRegParam(0.01)))
    // Size the cap from parquet row-group metadata (a count() on the
    // raw scan is metadata-only — no data pass), not by materializing
    // the full split: randomSplit(0.7) keeps 0.7·total in expectation,
    // and the sample is itself Bernoulli, so an expected-size fraction
    // is exactly as "capped at ~maxTrainRows" as one derived from an
    // exact count — one fewer full-table pass and a 4× smaller cache.
    val total = li.count()
    val expectedTrain = 0.7 * total
    val train =
      (if (expectedTrain > maxTrainRows)
        trainFull.sample(withReplacement = false, maxTrainRows / expectedTrain, 42L)
      else trainFull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fit makes several passes over the training side (scaler fit,
    // LR instance build, training summary) and each would otherwise
    // re-run the parquet scan + randomSplit + sample — cache the
    // SAMPLED frame (the only one fit touches) for the fit's duration
    train.count()
    val fitT0 = System.nanoTime()
    val model = pipeline.fit(train)
    lastFitSec = (System.nanoTime() - fitT0) / 1e9
    // blocking: the bench measures the NEXT query's wall-clock too —
    // a lazy unpersist leaves block eviction + GC of MLlib's fit-time
    // state to land inside whatever runs next (the r4 q42/q43 spikes)
    train.unpersist(blocking = true)
    // X10+P8: probability vector → array<double>, index P(label=1).
    // r19 note: scoring the test split through spreadNarrowCompute was
    // tried (parallelizes the per-row assemble/scale/predict chain,
    // probe A/B read as a wash-to-better) and REVERTED on bench
    // evidence: the in-suite cold-plan reading pays the extra
    // exchange + codegen every run — non-fit share 1.9–2.0 s without
    // vs 2.5–2.7 s with, across four artifact passes. The serialized
    // scoring task is a single-split test artifact; a multi-split
    // 100 TB test side parallelizes on its own.
    val scored = model.transform(test)
      .withColumn("probability_arr",
        org.apache.spark.ml.functions.vector_to_array(col("probability")))
      .withColumn("p1", col("probability_arr")(1))
    scored
      .groupBy("label", "prediction")
      .agg(count(lit(1)).as("n"), round(avg("p1"), 4).as("avg_p1"))
      .orderBy("label", "prediction")
  }

  /** R1+R2 demonstration: randomSplit + sample-with-replacement row
    * accounting. Seed-dependent ⇒ rows-only check; the invariants
    * (fractions, replacement blow-up) are asserted in ScalaTest.
    * The four counts are UNIONED single-row aggregates — one lazy
    * plan, one action, no driver-side count() loop.
    */
  def sampleSplitCounts(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val Array(train, test) = orders.randomSplit(Array(0.7, 0.3), 42L)
    val sampled = orders.sample(withReplacement = true, 0.5, 42L)
    def counted(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows")).select(lit(name).as("split"), col("n_rows"))
    counted("total", orders)
      .unionByName(counted("train", train))
      .unionByName(counted("test", test))
      .unionByName(counted("sampled_wr_0.5", sampled))
      .orderBy("split")
  }
}
