package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Sketches

/** Count-Min sketch (q134): the width=1 degenerate case has a closed
  * form (every key collides into one counter = the stream length), the
  * one-sided-error invariant is pinned on fixtures and the real events
  * table, and wide sketches over few keys recover exact counts.
  */
class SketchesSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}
  import spark.implicits._

  private def eventsDf(keys: Seq[Long]) =
    keys.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("event_id", "user_id")

  test("hllSlidingDistinct: trailing window includes only in-range hours; exact audit by hand") {
    import java.sql.Timestamp
    def ev(id: Long, t: String, u: Long) =
      (id, Timestamp.valueOf(t), u, "view", 1.0, "{}")
    // hour A: users 1, 2; hour A+5: user 3; hour A+30: user 4 (A and
    // A+5 are OUTSIDE its trailing 24 h window, A+5 is outside by 25h)
    val df = Seq(
      ev(1, "2024-01-01 00:10:00", 1L), ev(2, "2024-01-01 00:20:00", 2L),
      ev(3, "2024-01-01 05:10:00", 3L),
      ev(4, "2024-01-02 06:10:00", 4L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Sketches.hllSlidingDistinct(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(5)))
    // only the 3 REAL hours appear (no phantom trailing hours)
    assert(r.length == 3)
    val byH = r.toMap
    val hours = r.map(_._1).sorted
    assert(byH(hours(0))._1 == 2L, "hour A sees users {1,2}")
    assert(byH(hours(1))._1 == 3L, "hour A+5 sees {1,2,3} (A in range)")
    assert(byH(hours(2))._1 == 1L, "hour A+30 sees only user 4")
    // linear-counting branch is near-exact at tiny cardinalities
    r.foreach { case (_, (exact, est)) =>
      assert(math.abs(est - exact) < 0.1, s"estimate $est vs exact $exact") }
  }

  test("hllSlidingDistinct on the events table: one row per real hour, estimate tracks exact") {
    val ev = Tables.events(spark, sfDir)
    val r = Sketches.hllSlidingDistinct(ev).cache()
    val nHours = ev.select((unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
      .cast("bigint")).distinct().count()
    assert(r.count() == nHours)
    r.collect().foreach { x =>
      val exact = x.getLong(1).toDouble
      assert(math.abs(x.getDouble(5) - exact) / exact < 0.15,
        s"hour ${x.getLong(0)}: est ${x.getDouble(5)} vs exact $exact")
    }
    r.unpersist()
  }

  test("countMin width=1: every estimate is the stream length (total collision)") {
    val df = eventsDf(Seq(1L, 1L, 1L, 2L, 2L, 3L)) // 6 events, 3 keys
    val res = Sketches.countMinHeavyHitters(df, width = 1).collect()
    assert(res.length == 3)
    res.foreach { r =>
      assert(r.getLong(2) == 6L, s"width-1 estimate must be N: $r")
      assert(r.getLong(3) == 6L - r.getLong(1)) // overestimate = N - true
    }
    // ordered by true count desc, key-string asc
    assert(res.map(_.getString(0)).toSeq == Seq("1", "2", "3"))
    assert(res.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L))
  }

  test("countMin wide sketch over few keys: exact counts, zero overestimate") {
    // 3 keys into 4×4096 counters — collisions across all 4 rows are
    // practically impossible, so min-over-depths recovers the truth
    val df = eventsDf(Seq(7L, 7L, 7L, 7L, 8L, 8L, 9L))
    val res = Sketches.countMinHeavyHitters(df, width = 4096).collect()
    assert(res.map(r => r.getString(0) -> r.getLong(2)).toMap ==
      Map("7" -> 4L, "8" -> 2L, "9" -> 1L))
    assert(res.forall(_.getLong(3) == 0L))
  }

  test("countMin on the events table: one-sided error, top-N shape") {
    val res = Sketches.countMinHeavyHitters(Tables.events(spark, sfDir)).collect()
    assert(res.length <= 20 && res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"CMS underestimated: $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // true counts are non-increasing down the report
    val t = res.map(_.getLong(1))
    assert(t.zip(t.tail).forall { case (a, b) => a >= b })
  }

  // ---- q187 exactly-oracled HyperLogLog ------------------------------

  test("hllUsersByType: raw-estimate path lands within HLL error on 5000 users") {
    import org.apache.spark.sql.functions._
    // 5000 distinct users ≫ 2.5·m = 1280 → the α·m²/Σ path, not
    // linear counting; standard error ≈ 1.04/√512 ≈ 4.6%
    val df = spark.range(5000)
      .select(lit("t").as("event_type"), col("id").as("user_id"))
    val r = Sketches.hllUsersByType(df).collect()
    assert(r.length == 1)
    assert(r(0).getString(4) == "raw", r(0))
    val est = r(0).getDouble(5)
    assert(math.abs(est - 5000) / 5000 < 0.15, s"estimate $est")
    // register-max merge is order-free: identical after a reshuffle
    val r2 = Sketches.hllUsersByType(df.repartition(13)).collect()
    assert(r2(0).getDouble(5) == est)
  }

  test("hllOverlap: disjoint sets → near-zero intersection; nested sets → union = superset") {
    import org.apache.spark.sql.functions._
    // disjoint: users 1-2000 click, 2001-4000 view
    val disjoint = spark.range(1, 4001).select(
      when(col("id") <= 2000, lit("click")).otherwise(lit("view")).as("event_type"),
      col("id").as("user_id"))
    val dm = Sketches.hllOverlap(disjoint).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(dm("intersection")._1 == 0L)
    // inclusion–exclusion noise stays within HLL error of the union size
    assert(math.abs(dm("intersection")._2) < 0.2 * dm("union")._1, dm)
    // nested: viewers ⊂ clickers → union estimate == clicker estimate
    val nested = spark.range(1, 3001).select(lit("click").as("event_type"),
        col("id").as("user_id"))
      .unionByName(spark.range(1, 1001).select(lit("view").as("event_type"),
        col("id").as("user_id")))
    val nm = Sketches.hllOverlap(nested).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(nm("union")._2 == nm("a")._2, "register max over a superset is the superset")
    assert(nm("intersection")._1 == 1000L)
  }

  test("hllUsersByType on the corpus: linear-counting path, near-exact") {
    val res = Sketches.hllUsersByType(Tables.events(spark, sfDir)).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getString(4) == "linear", "15 users ≪ 2.5·m")
      val exact = r.getLong(1).toDouble
      assert(math.abs(r.getDouble(5) - exact) / exact < 0.1, r)
    }
  }
}
