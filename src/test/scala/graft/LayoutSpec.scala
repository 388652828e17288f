package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Layout

/** Data-layout operators (q132/q133): Z-order clustering keys and the
  * min/max file-statistics manifest. The key fixtures are bit-level
  * hand computations; the layout tests pin the property the operators
  * exist FOR — every z-bucket bounds BOTH dimensions at once, and the
  * manifest's scanned flag is exactly interval intersection.
  */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}
  import spark.implicits._

  // ---- zorderKey bit arithmetic --------------------------------------

  test("zorderKey: hand-computed interleaves") {
    // (a,b) → z with a's bit i at 2i+1, b's bit i at 2i:
    //  (0,0)→0, (1,0)→2, (0,1)→1, (3,1)→ a:1<<1|1<<3=10, b:1 → 11,
    //  (255,255)→65535 (all 16 bits set)
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L), (255L, 255L))
      .toDF("a", "b")
      .select(Layout.zorderKey(col("a"), col("b")).as("z"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 2L, 1L, 11L, 65535L))
  }

  test("zorderKey: masks to the low bits (values beyond 2^bits wrap)") {
    val df = Seq((256L, 257L)).toDF("a", "b") // ≡ (0, 1) mod 256
      .select(Layout.zorderKey(col("a"), col("b")).as("z"))
    assert(df.as[Long].collect()(0) == 1L)
  }

  // ---- zorderLayout --------------------------------------------------

  test("zorderLayout: every bucket bounds BOTH dimensions (the skipping payoff)") {
    val li = Tables.lineitem(spark, sfDir)
    val res = Layout.zorderLayout(li).collect()
    // partition of the table: bucket counts sum to the row count
    assert(res.map(_.getLong(1)).sum == li.count())
    res.foreach { r =>
      val zb = r.getLong(0)
      assert(zb >= 0 && zb < 64, s"bucket out of range: $zb")
      // a 1024-wide z-run fixes the top 3 bits of BOTH 8-bit dims →
      // each dimension spans ≤ 31 inside any bucket. A lexicographic
      // sort by (partkey, suppkey) would give suppkey spans of 255.
      assert(r.getLong(3) - r.getLong(2) <= 31L, s"bx span too wide in $r")
      assert(r.getLong(5) - r.getLong(4) <= 31L, s"by span too wide in $r")
    }
  }

  test("zorderLayout: single shuffle of #buckets rows (partial agg before exchange)") {
    val p = Layout.zorderLayout(Tables.lineitem(spark, sfDir))
      .queryExecution.executedPlan.toString
    // one hash exchange for the groupBy (plus the orderBy range
    // exchange over ≤64 rows); no join, no window, no cartesian
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(p.contains("partial_count") || p.contains("partial"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  // ---- statsManifest -------------------------------------------------

  test("statsManifest: scanned flag is interval intersection on a fixture") {
    def o(k: Long, ts: String, price: Double) =
      (k, 1L, "O", price, Timestamp.valueOf(ts), "1-URGENT")
    val df = Seq(
      o(1, "2024-01-05 00:00:00", 50000.0),  // Jan: [50k, 90k]  → miss (max < lo)
      o(2, "2024-01-20 00:00:00", 90000.0),
      o(3, "2024-02-10 00:00:00", 120000.0), // Feb: [120k,120k] → hit (inside)
      o(4, "2024-03-01 00:00:00", 99999.0),  // Mar: [99999,160k] → hit (straddles)
      o(5, "2024-03-31 00:00:00", 160000.0),
      o(6, "2024-04-15 00:00:00", 150001.0)  // Apr: [150001,∞) → miss (min > hi)
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
           "o_orderdate", "o_orderpriority")
    val res = Layout.statsManifest(df).collect()
    assert(res.length == 4)
    assert(res.map(_.getInt(6)).toSeq == Seq(0, 1, 1, 0))
    // the manifest records exact per-bucket stats
    val jan = res(0)
    assert(jan.getLong(1) == 2L)
    assert(jan.getDate(2).toString == "2024-01-05")
    assert(jan.getDate(3).toString == "2024-01-20")
    assert(jan.getDouble(4) == 50000.0 && jan.getDouble(5) == 90000.0)
  }

  test("statsManifest on orders: partition of the table, ranges sane") {
    val orders = Tables.orders(spark, sfDir)
    val res = Layout.statsManifest(orders).collect()
    assert(res.map(_.getLong(1)).sum == orders.count())
    res.foreach { r =>
      assert(!r.getDate(2).after(r.getDate(3)), s"date range inverted: $r")
      assert(r.getDouble(4) <= r.getDouble(5), s"price range inverted: $r")
      val expect = if (r.getDouble(5) >= 100000.0 && r.getDouble(4) <= 150000.0) 1 else 0
      assert(r.getInt(6) == expect, s"scanned flag wrong: $r")
    }
  }

  // ---- q149 compaction planner ---------------------------------------

  private def ordersDf(rows: Seq[(Long, String)]) = // (orderkey, day)
    rows.map { case (k, d) => (k, 1L, "O", 100.0,
      Timestamp.valueOf(d + " 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")

  test("compactionPlan: cumulative-before binning never splits a file") {
    // 105 bytes/row ("O"=1 + "1-URGENT"=8 + 96); days of 2/3/1 rows →
    // 210/315/105 bytes. target 300: cum_before 0, 210, 525 → groups
    // 0, 0, 1
    val df = ordersDf(Seq(
      1L -> "2024-01-01", 2L -> "2024-01-01",
      3L -> "2024-01-02", 4L -> "2024-01-02", 5L -> "2024-01-02",
      6L -> "2024-01-03"))
    val r = Layout.compactionPlan(df, targetBytes = 300L).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDate(4).toString, x.getDate(5).toString, x.getLong(6)))).toMap
    assert(r == Map(
      0L -> ((2L, 5L, 525L, "2024-01-01", "2024-01-02", 0L)),
      1L -> ((1L, 1L, 105L, "2024-01-03", "2024-01-03", 0L))))
  }

  test("compactionPlan on orders: groups tile the day axis, rows conserved") {
    val orders = Tables.orders(spark, sfDir)
    val r = Layout.compactionPlan(orders).collect()
    assert(r.map(_.getLong(2)).sum == orders.count())
    // consecutive groups: each group's first day follows the previous
    // group's last day
    r.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDate(4).before(b.getDate(4)) ||
          a.getDate(4).equals(b.getDate(4)),
          s"groups out of order: $a / $b")
      case _ =>
    }
    // no group except possibly the last ends under the target
    r.dropRight(1).foreach { g =>
      assert(g.getLong(3) > 0)
    }
  }
}
