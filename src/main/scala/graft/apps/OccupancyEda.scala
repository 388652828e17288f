package graft.apps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** The reference's 8-section batch EDA as composable DataFrame
  * builders (reference: eda/eda_analysis.py:19-183). Each section
  * returns a DataFrame instead of printing, so results are testable
  * and sinkable; `runFullEda` mirrors the original driver loop.
  */
object OccupancyEda {

  /** Numeric feature columns, excluding id and the label
    * (eda_analysis.py:11-16).
    */
  def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if Seq(DoubleType, IntegerType, LongType).contains(f.dataType) &&
        !Seq("id", "Occupancy").contains(f.name) => f.name
    }.toSeq

  /** §2: per-column null counts in one pass (eda_analysis.py:32-38). */
  def missingValues(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => sum(col(c).isNull.cast("int")).as(c)).toSeq: _*)

  /** §3.1: describe() over the numeric columns (eda_analysis.py:48). */
  def numericDescribe(df: DataFrame): DataFrame =
    df.select(numericCols(df).map(col): _*).describe()

  /** §3.2: approx percentiles 0/25/50/75/100, relErr 0.01
    * (eda_analysis.py:51-53).
    */
  def percentiles(df: DataFrame): Map[String, Array[Double]] =
    numericCols(df).map(c =>
      c -> df.stat.approxQuantile(c, Array(0.0, 0.25, 0.5, 0.75, 1.0), 0.01)).toMap

  /** §4: class distribution with percentage (eda_analysis.py:60-68). */
  def occupancyDistribution(df: DataFrame): DataFrame = {
    val total = df.count()
    df.groupBy("Occupancy")
      .agg(count(lit(1)).as("count"))
      .withColumn("percentage", round(col("count") * 100.0 / total, 2))
      .orderBy("Occupancy")
  }

  /** §5: per-class feature means (eda_analysis.py:79-88). */
  def meansByOccupancy(df: DataFrame): DataFrame = {
    val aggs = numericCols(df).map(c => round(avg(c), 3).as(s"avg_$c"))
    df.groupBy("Occupancy")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("Occupancy")
  }

  /** §6.1: occupancy rate by hour (eda_analysis.py:100-118). */
  def hourlyPattern(df: DataFrame): DataFrame =
    df.withColumn("hour", hour(col("datetime")))
      .groupBy("hour")
      .agg(count(lit(1)).as("n"),
        avg(col("Occupancy").cast("double")).as("occupancy_rate"))
      .orderBy("hour")

  /** §6.2: occupancy rate by day-of-week, Monday=1 remap
    * (eda_analysis.py:103-130).
    */
  def dowPattern(df: DataFrame): DataFrame =
    df.withColumn("day_of_week", ((dayofweek(col("datetime")) + 5) % 7) + 1)
      .groupBy("day_of_week")
      .agg(count(lit(1)).as("n"),
        avg(col("Occupancy").cast("double")).as("occupancy_rate"))
      .orderBy("day_of_week")

  /** §7: Pearson correlation of each feature with the label
    * (eda_analysis.py:133-141).
    */
  def labelCorrelations(df: DataFrame): Map[String, Double] = {
    val withD = df.withColumn("Occupancy_double", col("Occupancy").cast("double"))
    numericCols(df).map(c => c -> withD.stat.corr(c, "Occupancy_double")).toMap
  }

  /** §8: threshold-rule occupancy rates (eda_analysis.py:147-165). */
  def simpleRules(df: DataFrame, lightThreshold: Double = 300.0,
                  co2Threshold: Double = 1000.0): DataFrame = {
    def rate(pred: org.apache.spark.sql.Column, name: String): DataFrame =
      df.filter(pred).agg(lit(name).as("rule"),
        avg(col("Occupancy").cast("double")).as("occupancy_rate"))
    rate(col("Light") > lightThreshold, "light_gt")
      .unionByName(rate(col("CO2") > co2Threshold, "co2_gt"))
      .unionByName(rate(col("Light") <= lightThreshold && col("CO2") <= co2Threshold, "both_le"))
  }

  /** The full report, one action per section (eda_analysis.py:173-183). */
  def runFullEda(all: DataFrame): Map[String, Long] = {
    val sections = Map(
      "missing" -> missingValues(all).count(),
      "describe" -> numericDescribe(all).count(),
      "distribution" -> occupancyDistribution(all).count(),
      "means" -> meansByOccupancy(all).count(),
      "hourly" -> hourlyPattern(all).count(),
      "dow" -> dowPattern(all).count(),
      "rules" -> simpleRules(all).count())
    val _ = (percentiles(all), labelCorrelations(all))
    sections
  }
}
