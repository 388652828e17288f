package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.streaming.StreamPipeline

/** The spark.sql(...) string entry point over registered views, and
  * the foreachBatch sink pattern.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("registered views make every table SQL-addressable; SQL equals DataFrame results") {
    Tables.registerViews(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, round(avg(l_quantity), 3) AS avg_qty,
        |round(avg(l_extendedprice), 3) AS avg_price,
        |round(avg(l_discount), 4) AS avg_disc, round(avg(l_tax), 4) AS avg_tax
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val viaDf = graft.operators.Aggregates.avgByGroup(Tables.lineitem(spark, sfDir)).collect()
    assert(viaSql.sameElements(viaDf))
    assert(spark.sql("SELECT count(*) FROM events").head().getLong(0) ==
      Tables.events(spark, sfDir).count())
  }

  test("round-8 grouping-set and window families are SQL-addressable, equal to the operators") {
    Tables.registerViews(spark, sfDir)
    val cubeSql = spark.sql(
      """SELECT coalesce(l_returnflag, '(all)') AS flag,
        |coalesce(l_linestatus, '(all)') AS status,
        |CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |CAST(grouping(l_linestatus) AS INT) AS g_status,
        |count(1) AS n, round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, flag, status""".stripMargin).collect()
    val cubeDf = graft.operators.Aggregates
      .cubeFlagStatus(Tables.lineitem(spark, sfDir)).collect()
    assert(cubeSql.sameElements(cubeDf))
    val rankSql = spark.sql(
      """SELECT o_orderkey, o_orderpriority,
        |ntile(4) OVER w AS quartile,
        |round(percent_rank() OVER w, 6) AS pct_rank,
        |round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin).collect()
    val rankDf = graft.operators.Aggregates
      .priceRankFamily(Tables.orders(spark, sfDir)).collect()
    assert(rankSql.sameElements(rankDf))
    // q154's hand-picked GROUPING SETS via the SQL string form — the
    // Dataset groupingSets API and GROUP BY GROUPING SETS must plan
    // the same answer
    val gsSql = spark.sql(
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |coalesce(o_orderpriority, '(all)') AS priority,
        |CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |count(1) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY g_status, status, priority""".stripMargin).collect()
    val gsDf = graft.operators.Aggregates
      .marginalsGroupingSets(Tables.orders(spark, sfDir)).collect()
    assert(gsSql.sameElements(gsDf))
  }

  test("foreachBatch sink receives batches with stable ids and writes them as batch frames") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val query = StreamPipeline.foreachBatchSink(
      graft.operators.JsonRouting.validityRouting(stream, ordered = false),
      java.nio.file.Files.createTempDirectory("graft-feb").toString) { (batch, id) =>
        seen.put(id, batch.count()) // arbitrary batch-writer code
        ()
      }.start()
    try {
      val t = Timestamp.valueOf("2026-01-01 09:00:00")
      mem.addData((1L, t, 1L, "click", 1.0, """{"k": 3}"""), (2L, t, 1L, "view", 2.0, """{"k": 4}"""))
      query.processAllAvailable()
      mem.addData((10L, t, 2L, "click", 3.0, """{"k": 5}"""))
      query.processAllAvailable()
      assert(seen.keySet.toSeq.sorted == Seq(0L, 1L))
      assert(seen.values.sum == 3L)
    } finally query.stop()
  }

  test("SQL PIVOT / UNPIVOT clauses equal the q170/q171 DataFrame operators") {
    Tables.registerViews(spark, sfDir)
    // PIVOT clause with the same declared domain; coalesce mirrors the
    // operator's zero-fill
    val pivotSql = spark.sql(
      """SELECT month, coalesce(O, 0) AS n_open, coalesce(F, 0) AS n_finished,
        |coalesce(P, 0) AS n_pending FROM (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         o_orderstatus FROM orders)
        |PIVOT (count(1) FOR o_orderstatus IN ('O' AS O, 'F' AS F, 'P' AS P))
        |ORDER BY month""".stripMargin).collect()
    val pivotDf = graft.operators.Aggregates
      .pivotMonthlyStatus(Tables.orders(spark, sfDir)).collect()
    assert(pivotSql.sameElements(pivotDf))
    // UNPIVOT clause feeding the same quantized-mean profile
    val unpivotSql = spark.sql(
      """SELECT metric, count(1) AS n, min(value) AS min_value,
        |max(value) AS max_value,
        |round(CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
        |  / count(1) / 10000, 6) AS mean_value
        |FROM (SELECT l_quantity, l_extendedprice, l_discount, l_tax
        |      FROM lineitem)
        |UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice,
        |  l_discount, l_tax))
        |GROUP BY metric ORDER BY metric""".stripMargin).collect()
    val unpivotDf = graft.operators.Aggregates
      .unpivotMetricSummary(Tables.lineitem(spark, sfDir)).collect()
    assert(unpivotSql.sameElements(unpivotDf))
  }
}
