package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, TimestampType}

import graft.engine.{CsvSink, Tables}

/** The reference's merge/dedup/re-id ETL as a library facade
  * (reference: eda/merge_datasets.py:24-119 and eda/main.py:19-37):
  * load CSVs with provenance tag → unionByName → dropDuplicates on the
  * seven value columns → contiguous re-id via a fully-ordered
  * row_number → single-file CSV export.
  */
object OccupancyEtl {

  val valueCols: Seq[String] =
    Seq("date", "Temperature", "Humidity", "Light", "CO2", "HumidityRatio", "Occupancy")

  /** S1+P2+P3: one occupancy CSV with provenance tag and defensive
    * casts (eda/main.py:19-37). Explicit schema by default; inferSchema
    * parity available via schema=None.
    */
  def loadOccupancyFile(spark: SparkSession, path: String, setName: String,
                        inferSchema: Boolean = false): DataFrame = {
    val base = Tables.csv(spark, path,
      if (inferSchema) None else Some(Tables.occupancySchema))
    base.withColumn("set_name", lit(setName))
      .withColumn("id", col("id").cast(IntegerType))
      .withColumn("datetime", col("date").cast(TimestampType))
  }

  /** U1+U4+W2: merge, dedup on the value columns (id/set_name excluded
    * from the duplicate definition), re-id 1..n.
    *
    * SCALE NOTE: the unpartitioned row_number window is single-task —
    * kept for reference parity on the ~20k-row dataset; swap in
    * [[graft.operators.SetOps.distributedReid]] for large inputs.
    */
  def mergeAndDeduplicate(dfs: Seq[DataFrame]): DataFrame = {
    val all = dfs.reduce(_ unionByName _)
    val deduped = all.dropDuplicates(valueCols)
    val w = Window.orderBy(valueCols.map(col): _*)
    deduped
      .withColumn("id_new", row_number().over(w))
      .select((col("id_new").as("id") +: valueCols.map(col)): _*)
      .orderBy("id")
  }

  /** K1: the end-to-end ETL with single-file CSV export
    * (merge_datasets.py:87-119).
    */
  def runEtl(spark: SparkSession, paths: Seq[(String, String)], outFile: String): DataFrame = {
    val merged = mergeAndDeduplicate(
      paths.map { case (p, name) => loadOccupancyFile(spark, p, name) })
    CsvSink.writeSingleFile(merged, outFile)
    merged
  }
}
