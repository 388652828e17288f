package graft

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
}
