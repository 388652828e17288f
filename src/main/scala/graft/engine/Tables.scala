package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Readers for the driver's TPC-H-ish testdata star schema (TESTDATA.md)
  * plus explicit-schema CSV ingestion mirroring the reference's batch
  * sources (reference: eda/main.py:22-27, eda/merge_datasets.py:27-34,
  * ml/train_model.py:120-125 — CSV with header+inferSchema).
  *
  * Parquet is the scale path: columnar scans give Catalyst column
  * pruning + predicate pushdown for free (`PushedFilters`/`ReadSchema`
  * visible in `.explain("formatted")`), which a 100 TB deployment
  * relies on. CSV is kept for reference parity only.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive parallelism for EXPENSIVE narrow chains
    * (optimization guide §2.5 "input skew: one huge unsplittable
    * file … repartition immediately after the read").
    *
    * A parquet row group is read by exactly one task, so a table that
    * arrives as one small file — every table of this driver's
    * testdata, and the general "yesterday's single-writer extract"
    * case — scans as ONE task no matter how many cores the session
    * has. A narrow compute chain rooted on it (char-gram hashing,
    * shingle MinHash signatures — the heavy per-row text work) then
    * runs single-threaded until its first exchange: the round-18
    * bench read q121 at 1.1 effective cores on a 32-core session for
    * exactly this reason, and an A/B probe confirmed the diagnosis
    * (q121 2.0 → 0.65 s, q199 2.5 → 0.8 s with the scan spread).
    *
    * Deliberately NOT applied at every scan: the round-robin exchange
    * costs a stage + `defaultParallelism` task launches (~0.1–0.3 s
    * in local mode), which is pure tax for the many sub-second
    * column-aggregate queries — a blanket version of this helper
    * regressed the cheap half of the suite by more than the heavy
    * half gained. Operators whose per-row work is expensive enough to
    * dominate a single core call it at their scan; everything else
    * keeps the plain scan.
    *
    * Scale-safe by condition, not by tuning: only when the input
    * yields fewer than half the session's cores worth of partitions
    * (a 100 TB table arrives as thousands of splits and skips the
    * branch) is the repartition inserted, and the exchange then moves
    * only a provably small input. Filters/pruning push through
    * Repartition into the scan, and round-robin repartition sorts
    * before exchanging (SPARK-23207 default), so the layout is
    * deterministic under task retry.
    */
  private[graft] def spreadNarrowCompute(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** The events table's `ts` has shipped as BOTH parquet
    * TIMESTAMP(NANOS) (earlier testdata drops) and plain TIMESTAMP
    * micros (current drops) — so the reader adapts to the file's
    * footer instead of assuming either:
    *
    *  - NANOS: Spark 4 rejects it by default (PARQUET_TYPE_ILLEGAL);
    *    with `nanosAsLong` it arrives as a long, converted ns → µs by
    *    exact integer division (`div`, not `/` — ns-since-epoch
    *    exceeds 2^53, double division would lose precision).
    *    Floor-truncation matches DuckDB's ns → µs coercion.
    *  - micros, isAdjustedToUTC=false: arrives as TIMESTAMP_NTZ;
    *    cast to TIMESTAMP under the engine's UTC session zone — the
    *    same instants, and the same naive values DuckDB reads.
    *
    * Either way downstream operators see one schema: `ts` TIMESTAMP.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view so the whole engine
    * surface is reachable from `spark.sql(...)` strings as well as the
    * DataFrame API.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => table(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Occupancy sensor schema (reference dataset layout:
    * eda/dataset/datatraining.txt:1 — id,date,Temperature,Humidity,
    * Light,CO2,HumidityRatio,Occupancy). Declared explicitly rather
    * than inferred so oracle-checked reads can't diverge on inference
    * (SURVEY.md §7 gotchas).
    */
  val occupancySchema: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("Temperature", DoubleType, nullable = true),
    StructField("Humidity", DoubleType, nullable = true),
    StructField("Light", DoubleType, nullable = true),
    StructField("CO2", DoubleType, nullable = true),
    StructField("HumidityRatio", DoubleType, nullable = true),
    StructField("Occupancy", IntegerType, nullable = true)
  ))

  /** CSV batch scan, reference-style (S1). `inferSchema` optional; an
    * explicit schema wins when provided (the scale-safe default — one
    * less full pass over the data, no type drift between runs).
    */
  def csv(spark: SparkSession, path: String,
          schema: Option[StructType] = None,
          header: Boolean = true, sep: String = ","): DataFrame = {
    val r = spark.read.option("header", header.toString).option("sep", sep)
    schema match {
      case Some(sc) => r.schema(sc).csv(path)
      case None     => r.option("inferSchema", "true").csv(path)
    }
  }

  /** ORC scan — the other columnar format a lakehouse migration meets
    * (Hive-era warehouses are predominantly ORC). Spark's reader gives
    * it the same Catalyst treatment as parquet — column pruning and
    * predicate pushdown reach the scan (`PushedFilters`/`ReadSchema`
    * in explain), so an ORC-resident corpus runs every operator here
    * at columnar-scan speed without conversion.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-Lines scan — the de-facto interchange format for LLM
    * training corpora (one document object per line). The schema is
    * REQUIRED: inference reads the whole corpus twice and silently
    * unions divergent shapes, both unacceptable at 100 TB. Rows that
    * do not parse land in `_corrupt_record` (PERMISSIVE) instead of
    * failing the job — route them like [[graft.operators.JsonRouting]]
    * routes bad payloads.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
}
