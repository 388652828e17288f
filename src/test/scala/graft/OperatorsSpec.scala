package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{CsvSink, Tables}
import graft.operators._

/** Relational operator layer: projections, filters, aggregates,
  * set ops, joins — fixture facts computed independently where
  * possible (the DuckDB oracle covers exact parity; these specs cover
  * semantics and invariants).
  */
class OperatorsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val lineitem = Tables.lineitem(spark, sfDir).cache()
  private lazy val orders   = Tables.orders(spark, sfDir).cache()
  private lazy val events   = Tables.events(spark, sfDir).cache()

  test("events.ts arrives as a usable timestamp (nanos source)") {
    val t = events.select(col("ts")).schema.fields.head.dataType
    assert(t == org.apache.spark.sql.types.TimestampType)
    assert(events.filter(col("ts").isNull).count() == 0)
  }

  test("hourlyActivity covers all hours present and sums to total rows") {
    val res = Aggregates.hourlyActivity(events).collect()
    assert(res.map(_.getLong(1)).sum == events.count())
    val hours = res.map(_.getInt(0))
    assert(hours.sameElements(hours.sorted))
    assert(hours.forall(h => h >= 0 && h <= 23))
  }

  test("dow remap lands in 1..7 with Monday=1 semantics") {
    val res = Aggregates.dowActivity(events).collect()
    assert(res.map(_.getInt(0)).forall(d => d >= 1 && d <= 7))
    assert(res.map(_.getLong(1)).sum == events.count())
  }

  test("statusDistribution percentages sum to ~100") {
    val pcts = Aggregates.statusDistribution(orders).collect().map(_.getDouble(2))
    assert(math.abs(pcts.sum - 100.0) < 0.05)
  }

  test("nullCounts matches filter-based counts") {
    val expectedEtype = events.filter(col("event_type") === "error").count()
    val expectedV = events.filter(col("value") < 5.0).count()
    val r = Aggregates.nullCounts(events).head()
    assert(r.getLong(0) == expectedEtype)
    assert(r.getLong(1) == expectedV)
    assert(r.getLong(2) == events.count())
  }

  test("describeStats agrees with df.describe") {
    val r = Aggregates.describeStats(lineitem).head()
    val d = lineitem.describe("l_quantity").collect()
      .map(row => row.getString(0) -> row.getString(1)).toMap
    assert(r.getLong(0) == d("count").toLong)
    assert(math.abs(r.getDouble(1) - d("mean").toDouble) < 1e-3)
    assert(r.getDouble(3) == d("min").toDouble)
    assert(r.getDouble(4) == d("max").toDouble)
  }

  test("approxQuantile (Greenwald-Khanna, relErr 0.01) brackets exact percentiles") {
    val exact = Aggregates.quantilesByGroup(lineitem).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Aggregates.approxQuantilesByGroup(lineitem).collect()
    approx.foreach { r =>
      val (q25, q50, q75) = exact(r.getString(0))
      // rank error ≤ 1% of group size ⇒ values should be within a few units here
      assert(math.abs(r.getDouble(1) - q25) <= 3.0)
      assert(math.abs(r.getDouble(2) - q50) <= 3.0)
      assert(math.abs(r.getDouble(3) - q75) <= 3.0)
    }
    // the DataFrame stat API variant (the reference's literal call, eda_analysis.py:52)
    val qs = lineitem.stat.approxQuantile("l_quantity", Array(0.25, 0.5, 0.75), 0.01)
    assert(qs.length == 3 && qs(0) <= qs(1) && qs(1) <= qs(2))
  }

  test("JSONL corpus source: declared schema; corrupt lines routed, not fatal") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    java.nio.file.Files.writeString(dir.resolve("part-0.jsonl"),
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr"}
        |this line is not json
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("_corrupt_record", StringType)))
    val df = Tables.jsonl(spark, dir.toString, schema).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("doc_id") === 1L).head().getString(1) == "hello world")
    df.unpersist()
  }

  test("JSONL sink roundtrips through the JSONL source, partition dirs included") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val docs = Seq((1L, "hello world", "en"), (2L, "bonjour", "fr"),
      (3L, "with \"quotes\" and\nnewline", "en")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-sink").toString
    graft.engine.JsonlSink.writePartitioned(docs, dir, partitionBy = Seq("lang"))
    assert(new java.io.File(dir, "lang=en").isDirectory) // prunable layout
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val back = Tables.jsonl(spark, dir, schema)
    assert(back.count() == 3)
    // JSON escaping survives the roundtrip byte-for-byte
    assert(back.filter(col("doc_id") === 3L).head().getString(1)
      == "with \"quotes\" and\nnewline")
  }

  test("dynamic partition overwrite replaces only the partitions being written") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpo").toString
    val day1 = Seq((1L, "a", "src0"), (2L, "b", "src1")).toDF("doc_id", "text", "source")
    graft.engine.ParquetSink.overwritePartitions(day1, dir, Seq("source"))
    // incremental refresh: re-land ONLY src0 with new content
    val day2 = Seq((3L, "a2", "src0")).toDF("doc_id", "text", "source")
    graft.engine.ParquetSink.overwritePartitions(day2, dir, Seq("source"))
    val back = spark.read.parquet(dir)
    // src0 replaced, src1 untouched — a static overwrite would have
    // truncated src1 away
    assert(back.filter(col("source") === "src0").collect().map(_.getLong(0)).toSet == Set(3L))
    assert(back.filter(col("source") === "src1").collect().map(_.getLong(0)).toSet == Set(2L))
    // the session default is restored after the write
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_.equalsIgnoreCase("static")))
  }

  test("ORC sink roundtrips through the ORC source with pushdown-ready layout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val docs = Seq((1L, "alpha", "en"), (2L, "beta", "de"), (3L, "gamma", "en"))
      .toDF("doc_id", "text", "lang")
    graft.engine.OrcSink.writePartitioned(docs, dir, partitionBy = Seq("lang"))
    assert(new java.io.File(dir, "lang=en").isDirectory) // prunable layout
    val back = Tables.orc(spark, dir)
    assert(back.count() == 3)
    assert(back.filter(col("lang") === "en").count() == 2)
    // values survive and filters reach the scan (partition pruning)
    assert(back.filter(col("doc_id") === 2L).head().getString(1) == "beta")
    val plan = back.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("lang=en")
      || !plan.contains("lang=de"), plan)
  }

  test("session_window merges within-gap events and splits at the exact-gap boundary") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2026-01-01 10:29:59"), 1L, "view", 2.0, "{}"),  // < gap: merges
      (3L, ts("2026-01-01 10:59:59"), 1L, "view", 3.0, "{}"),  // < gap from prev: merges
      (4L, ts("2026-01-01 11:29:59"), 1L, "view", 4.0, "{}"),  // EXACTLY 30:00 after #3: still merges (diff <= gap)
      (5L, ts("2026-01-01 12:00:00"), 1L, "view", 6.0, "{}"),  // 30:01 after #4: NEW session
      (6L, ts("2026-01-01 09:00:00"), 2L, "click", 5.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = Aggregates.sessionWindowAgg(ev).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(res.toSeq == Seq(
      (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 11:59:59"), 4L),
      (1L, ts("2026-01-01 12:00:00"), ts("2026-01-01 12:30:00"), 1L),
      (2L, ts("2026-01-01 09:00:00"), ts("2026-01-01 09:30:00"), 1L)), res.toSeq.toString)
  }

  test("as-of click attribution matches hand-computed nearest-earlier semantics") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2026-01-01 10:05:00"), 1L, "purchase", 5.0, "{}"),
      (3L, ts("2026-01-01 10:10:00"), 1L, "click", 1.0, "{}"),
      // tie: click at the exact purchase instant IS attributable
      (4L, ts("2026-01-01 10:10:00"), 1L, "purchase", 9.0, "{}"),
      // purchase with no prior click: excluded (inner as-of)
      (5L, ts("2026-01-01 09:00:00"), 2L, "purchase", 7.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = Joins.clickAttribution(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getTimestamp(4)))).toMap
    assert(res == Map(
      2L -> ((1L, ts("2026-01-01 10:00:00"))),
      4L -> ((3L, ts("2026-01-01 10:10:00")))))
  }

  test("corr matches the df.stat.corr API (reference call shape)") {
    val viaAgg = Aggregates.correlations(lineitem).head().getDouble(0)
    val viaStat = lineitem.stat.corr("l_quantity", "l_extendedprice")
    assert(math.abs(viaAgg - viaStat) < 1e-5)
  }

  test("moneyRound halves round up and never drifts from cents") {
    val df = spark.range(1).select(
      Projections.moneyRound(lit(2.675)).as("a"),
      Projections.moneyRound(lit(2.674)).as("b"),
      Projections.moneyRound(lit(123.455)).as("c"))
    val r = df.head()
    assert(r.getDouble(0) == 2.68)
    assert(r.getDouble(1) == 2.67)
    assert(r.getDouble(2) == 123.46)
  }

  test("unionDedupReid: dedup removes exactly the re-appended slice; ids contiguous") {
    val res = SetOps.unionDedupReid(orders)
    val n = res.count()
    assert(n == orders.count()) // dedup collapses the duplicated 'F' slice
    val ids = res.select("new_id").collect().map(_.getInt(0))
    assert(ids.head == 1 && ids.last == n)
    assert(ids.toSet.size == n.toInt)
  }

  test("dedup is idempotent") {
    val once = SetOps.unionDedupReid(orders).drop("new_id")
    assert(once.dropDuplicates().count() == once.count())
  }

  test("distributedReid matches the single-task window re-id") {
    val proj = orders.select("o_orderkey", "o_custkey")
    val viaWindow = proj.withColumn("new_id",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("o_orderkey")))
      .select(col("o_orderkey"), col("new_id").cast("long"))
    val viaZip = SetOps.distributedReid(proj, Seq("o_orderkey"))
      .select("o_orderkey", "new_id")
    assert(viaWindow.exceptAll(viaZip).count() == 0)
    assert(viaZip.exceptAll(viaWindow).count() == 0)
  }

  test("topNPerGroup returns at most N per key, ranked by totalprice") {
    val res = SetOps.topNPerGroup(orders, 3)
    val maxPerKey = res.groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(maxPerKey <= 3)
    val worstRank1 = res.filter(col("rk") === 1).agg(min("o_totalprice")).head().getDouble(0)
    val bestRank3 = res.filter(col("rk") === 3)
      .join(res.filter(col("rk") === 1).select(col("o_custkey"), col("o_totalprice").as("p1")), "o_custkey")
      .filter(col("o_totalprice") > col("p1")).count()
    assert(bestRank3 == 0)
    assert(worstRank1 >= 0)
  }

  test("left join keeps customers with zero matching orders") {
    val res = Joins.ordersPerCustomer(Tables.customer(spark, sfDir), orders)
    assert(res.count() == Tables.customer(spark, sfDir).count())
    val zeros = res.filter(col("n_orders") === 0)
    zeros.collect().foreach(r => assert(r.getDouble(3) == 0.0))
  }

  test("semi ∪ anti partitions the customer set") {
    val cust = Tables.customer(spark, sfDir)
    val pending = orders.filter(col("o_orderstatus") === "P")
    val semi = cust.join(pending, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = Joins.customersWithoutPendingOrders(cust, orders).count()
    assert(semi + anti == cust.count())
  }

  test("dimension joins are planned as broadcasts") {
    val plan = Joins.revenueByNation(lineitem, orders,
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir), Tables.region(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("filter pushdown reaches the parquet scan") {
    // use a table no suite caches — a cached InMemoryRelation would
    // shadow the FileScan and hide the pushdown
    val plan = Tables.part(spark, sfDir)
      .filter(col("p_size") > 20).select("p_partkey", "p_size")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,20)]"), plan)
    assert(plan.contains("ReadSchema: struct<p_partkey:bigint,p_size:int>"), plan)
  }

  test("single-file CSV sink round-trips (K1)") {
    val out = java.nio.file.Files.createTempDirectory("graft-csv").resolve("export.csv").toString
    val src = Aggregates.avgByGroup(lineitem)
    CsvSink.writeSingleFile(src, out)
    assert(new java.io.File(out).isFile)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == src.count())
    assert(back.columns.sameElements(src.columns))
  }

  test("explicit-schema CSV scan round-trips occupancy-shaped data (S1)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-occ").toString
    val df = Seq((1, "2015-02-04 17:51:00", 23.18, 27.272, 426.0, 721.25, 0.00479, 1))
      .toDF("id", "date", "Temperature", "Humidity", "Light", "CO2", "HumidityRatio", "Occupancy")
    CsvSink.writePartitioned(df, dir)
    val back = Tables.csv(spark, dir, Some(Tables.occupancySchema))
    assert(back.count() == 1)
    assert(back.schema == Tables.occupancySchema)
    val inferred = Tables.csv(spark, dir, None)
    assert(inferred.count() == 1)
  }
}
