package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators._

/** The eight operators the round-7 snapshot landed dark (cube, moving
  * z-score, rank family, random projection, text normalize, char
  * entropy, doc chunking, latest-per-key), now wired as q94–q101.
  * Every test computes its expectation independently (hand math, a
  * reference window formulation, or an in-memory fixture with known
  * answers) — the DuckDB oracle covers engine parity; these cover
  * semantics, including the empty-text guard branches that ANSI mode
  * turns into hard errors when missed.
  */
class SnapshotOpsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}
  import spark.implicits._

  private lazy val lineitem = Tables.lineitem(spark, sfDir).cache()
  private lazy val orders   = Tables.orders(spark, sfDir).cache()
  private lazy val events   = Tables.events(spark, sfDir).cache()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- q94 cube -----------------------------------------------------

  test("cube emits the full grouping-set lattice and a correct grand total") {
    val res = Aggregates.cubeFlagStatus(lineitem).collect()
    val nFlags = lineitem.select("l_returnflag").distinct().count()
    val nStats = lineitem.select("l_linestatus").distinct().count()
    assert(res.length == (nFlags + 1) * (nStats + 1))
    val grand = res.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length == 1)
    assert(grand.head.getLong(4) == lineitem.count())
    // the rollup operator's rows are a strict subset of the cube's
    val cubeKeys = res.map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSet
    val rollKeys = Aggregates.rollupFlagStatus(lineitem).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSet
    assert(rollKeys.subsetOf(cubeKeys))
  }

  // ---- q154 grouping sets -------------------------------------------

  test("groupingSets emits exactly the two marginal strata, each totalling the fact") {
    val res = Aggregates.marginalsGroupingSets(orders).collect()
    val nStatus = orders.select("o_orderstatus").distinct().count()
    val nPrio   = orders.select("o_orderpriority").distinct().count()
    // no cross-product stratum, no grand total — just the two marginals
    assert(res.length == nStatus + nPrio)
    val statusRows = res.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
    val prioRows   = res.filter(r => r.getInt(2) == 1 && r.getInt(3) == 0)
    assert(statusRows.length == nStatus && prioRows.length == nPrio)
    assert(statusRows.map(_.getLong(4)).sum == orders.count())
    assert(prioRows.map(_.getLong(4)).sum == orders.count())
    // the masked key reads the sentinel in each stratum
    assert(statusRows.forall(_.getString(1) == "(all)"))
    assert(prioRows.forall(_.getString(0) == "(all)"))
  }

  // ---- q159 Benford audit -------------------------------------------

  test("benfordAudit: leading digits extracted exactly, shares close over the set") {
    import spark.implicits._
    // cents 100 / 1999 / 25000 / 950 → digits 1, 1, 2, 9 — includes a
    // power-of-ten boundary (1.00) and a 9.5 that rounding-based digit
    // extraction would misread as 1(0...)
    val df = Seq((1L, 1.00), (2L, 19.99), (3L, 250.0), (4L, 9.5))
      .toDF("o_orderkey", "o_totalprice")
    val res = Aggregates.benfordAudit(df).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(res == Map(1 -> 2L, 2 -> 1L, 9 -> 1L))
  }

  test("benfordAudit on orders: digits 1-9 only, shares sum to 1, expectations fixed") {
    val res = Aggregates.benfordAudit(orders).collect()
    assert(res.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    assert(res.map(_.getLong(1)).sum == orders.filter(col("o_totalprice") > 0).count())
    assert(math.abs(res.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    // the Benford expectation column is the ln-ratio constant per digit
    res.foreach { r =>
      val d = r.getInt(0)
      assert(r.getDouble(3) ==
        math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e6 + 0.5) / 1e6)
    }
  }

  // ---- q166 expectations audit --------------------------------------

  test("expectationsAudit: seeded violations land in the right checks") {
    import spark.implicits._
    // row 3 duplicates the key; row 4 has a null customer; row 5 a bad
    // status; all prices positive; priority '6-X' fails the format
    val df = Seq(
      (1L, Some(10L), "O", 5.0, "1-URGENT"),
      (2L, Some(11L), "F", 6.0, "5-LOW"),
      (2L, Some(12L), "P", 7.0, "3-MEDIUM"),
      (4L, None: Option[Long], "O", 8.0, "2-HIGH"),
      (5L, Some(13L), "X", 9.0, "6-BOGUS"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val res = Aggregates.expectationsAudit(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(4))))
      .toMap
    assert(res("unique:o_orderkey") == ((4L, 5L, 0)))
    assert(res("completeness:o_custkey") == ((4L, 5L, 0)))
    assert(res("accepted_values:o_orderstatus") == ((4L, 5L, 0)))
    assert(res("positive:o_totalprice") == ((5L, 5L, 1)))
    assert(res("format:o_orderpriority") == ((4L, 5L, 0)))
  }

  test("expectationsAudit on orders: the TPC-H generator passes the whole suite") {
    val res = Aggregates.expectationsAudit(orders).collect()
    assert(res.length == 5)
    res.foreach { r =>
      assert(r.getInt(4) == 1, s"expectation unexpectedly failing: $r")
      assert(r.getDouble(3) == 1.0)
    }
  }

  // ---- q168 k-anonymity / l-diversity -------------------------------

  test("kAnonymityAudit: class sizes, band diversity, and both flags by hand") {
    import spark.implicits._
    // class (1, A): 3 members, bands {0, 0, 1} → l_div 2 → k-fail (k=10),
    // l-fail (l=3); class (2, B): 10 members, bands 0..9 → both pass;
    // a negative balance lands in band −1 (floor, not truncation)
    val rows =
      Seq((1L, "c", 1, 500.0, "A"), (2L, "c", 1, 900.0, "A"),
        (3L, "c", 1, 1500.0, "A"), (4L, "c", 3, -500.0, "C")) ++
      (1 to 10).map(i => ((10 + i).toLong, "c", 2, i * 1000.0 - 500, "B"))
    val df = rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    val res = Aggregates.kAnonymityAudit(df).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    assert(res((1, "A")) == ((3L, 2L, 0, 0)))
    assert(res((2, "B")) == ((10L, 10L, 1, 1)))
    assert(res((3, "C")) == ((1L, 1L, 0, 0)))
  }

  test("kAnonymityAudit on customer: classes partition the table; flags consistent") {
    val cust = Tables.customer(spark, sfDir)
    val res = Aggregates.kAnonymityAudit(cust).collect()
    assert(res.map(_.getLong(2)).sum == cust.count())
    res.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "l-diversity cannot exceed class size")
      assert((r.getInt(4) == 1) == (r.getLong(2) >= 10))
      assert((r.getInt(5) == 1) == (r.getLong(3) >= 3))
    }
  }

  // ---- q170 pivot / q171 unpivot ------------------------------------

  test("pivotMonthlyStatus: declared domain, zero-filled cells, exact counts") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, 1L, "O", 10.0, ts("2024-01-05 00:00:00"), "1-URGENT"),
      (2L, 2L, "O", 10.0, ts("2024-01-20 00:00:00"), "1-URGENT"),
      (3L, 3L, "F", 10.0, ts("2024-01-21 00:00:00"), "1-URGENT"),
      (4L, 4L, "P", 10.0, ts("2024-02-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val res = Aggregates.pivotMonthlyStatus(df).collect()
    assert(res.length == 2)
    assert((res(0).getLong(1), res(0).getLong(2), res(0).getLong(3)) == ((2L, 1L, 0L)))
    assert((res(1).getLong(1), res(1).getLong(2), res(1).getLong(3)) == ((0L, 0L, 1L)))
  }

  test("pivot on orders: wide counts re-sum to the table total") {
    val res = Aggregates.pivotMonthlyStatus(orders).collect()
    assert(res.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum ==
      orders.count())
  }

  test("unpivotMetricSummary: four metrics, hand-checked stats") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, 1L, 1L, 1, 2.0, 100.50, 0.05, 0.02, "N", "O", ts("2024-01-01 00:00:00")),
      (2L, 2L, 2L, 2, 4.0, 200.00, 0.10, 0.04, "N", "O", ts("2024-01-02 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val res = Aggregates.unpivotMetricSummary(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(res("l_quantity") == ((2L, 2.0, 4.0, 3.0)))
    assert(res("l_extendedprice") == ((2L, 100.50, 200.00, 150.25)))
    assert(res("l_discount") == ((2L, 0.05, 0.10, 0.075)))
    assert(res("l_tax") == ((2L, 0.02, 0.04, 0.03)))
  }

  test("unpivot on lineitem: every metric row count equals the table count") {
    val res = Aggregates.unpivotMetricSummary(lineitem).collect()
    assert(res.length == 4)
    res.foreach { r =>
      assert(r.getLong(1) == lineitem.count())
      assert(r.getDouble(2) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(3),
        s"mean outside [min, max]: $r")
    }
  }

  // ---- q172 referential integrity -----------------------------------

  test("refIntegrityAudit: seeded orphan and null FK land on the right edge") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cust = Seq((1L, "c", 1, 0.0, "A"), (2L, "c", 1, 0.0, "A"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val ord = Seq(
      (10L, Some(1L), "O", 1.0, ts("2024-01-01 00:00:00"), "1-U"),
      (11L, Some(99L), "O", 1.0, ts("2024-01-01 00:00:00"), "1-U"), // orphan
      (12L, None: Option[Long], "O", 1.0, ts("2024-01-01 00:00:00"), "1-U")) // null FK
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq(
      (10L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00")),
      (77L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("2024-01-01 00:00:00"))) // orphan
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val res = Joins.refIntegrityAudit(ord, cust, li).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(5)))).toMap
    assert(res("orders.o_custkey->customer") == ((3L, 1L, 1L, 0)))
    assert(res("lineitem.l_orderkey->orders") == ((2L, 1L, 0L, 0)))
  }

  test("refIntegrityAudit on the corpus: the generator's FK edges are intact") {
    val res = Joins.refIntegrityAudit(orders,
      Tables.customer(spark, sfDir), lineitem).collect()
    assert(res.length == 2)
    res.foreach { r =>
      assert(r.getInt(5) == 1 && r.getLong(2) == 0L,
        s"unexpected orphans in generated data: $r")
    }
  }

  // ---- q173 props profile / q174 set relations ----------------------

  test("propsProfile: open-map parse, numeric detection, malformed dropped") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, """{"k": 69, "tag": "a"}"""),
      (2L, ts("2024-01-01 10:01:00"), 1L, "view", 1.0, """{"k": 31}"""),
      (3L, ts("2024-01-01 10:02:00"), 1L, "view", 1.0, """not json"""),
      (4L, ts("2024-01-01 10:03:00"), 1L, "buy", 1.0, """{"tag": "7"}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = JsonRouting.propsProfile(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(res(("view", "k")) == ((2L, 2L)))
    assert(res(("view", "tag")) == ((1L, 0L)), "'a' is not numeric")
    assert(res(("buy", "tag")) == ((1L, 1L)), "'7' parses as numeric")
    assert(res.size == 3, "the malformed row contributes no keys")
  }

  test("propsProfile on events: totals reconcile; min <= max on numeric keys") {
    val res = JsonRouting.propsProfile(events).collect()
    assert(res.map(_.getLong(2)).sum == events.count(),
      "single-key corpus: one map entry per event")
    res.filter(_.getLong(3) > 0).foreach(r =>
      assert(r.getDouble(4) <= r.getDouble(5)))
  }

  test("setRelations: inclusion-exclusion holds on a seeded overlap") {
    import spark.implicits._
    val df = (Seq(
      (1L, "shared one", "src0"), (2L, "only a", "src0"),
      (3L, "only a too", "src0"), (4L, "shared one", "src1"),
      (5L, "only b", "src1"), (6L, "only a", "src0"))) // intra-A dup → distinct
      .map { case (i, t, s) => (i, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = SetOps.setRelations(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res == Map("a_distinct" -> 3L, "a_minus_b" -> 2L,
      "b_distinct" -> 2L, "b_minus_a" -> 1L, "intersect" -> 1L))
  }

  test("setRelations on documents: the five cardinals are consistent") {
    val res = SetOps.setRelations(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res("a_distinct") == res("intersect") + res("a_minus_b"))
    assert(res("b_distinct") == res("intersect") + res("b_minus_a"))
  }

  // ---- q95 moving z-score -------------------------------------------

  test("movingZscore matches a hand-rolled trailing window per event type") {
    val flagged = Aggregates.movingZscore(events).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // recompute for every type with a plain Scala sliding window
    val rows = events.select("event_type", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val expected = scala.collection.mutable.Map[Long, Double]()
    rows.groupBy(_._1).foreach { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      for (i <- sorted.indices) {
        val frame = sorted.slice(math.max(0, i - 10), i).flatMap(_._4)
        sorted(i)._4.foreach { v =>
          if (frame.length >= 2) {
            val ma = frame.sum / frame.length
            val sd = math.sqrt(frame.map(x => (x - ma) * (x - ma)).sum / (frame.length - 1))
            if (sd > 0) {
              val z = BigDecimal((v - ma) / sd).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (math.abs(z) > 3.0) expected(sorted(i)._3) = z
            }
          }
        }
      }
    }
    assert(flagged.keySet == expected.keySet)
    flagged.foreach { case (id, z) => assert(math.abs(z - expected(id)) < 1e-9, s"event $id") }
  }

  // ---- q96 rank family ----------------------------------------------

  test("priceRankFamily: ranks bounded, counts preserved, extremes exact") {
    val res = Aggregates.priceRankFamily(orders).collect()
    assert(res.length == orders.count())
    assert(res.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 4))
    assert(res.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(res.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
    // per group: the most expensive order has pct_rank 0 / quartile 1,
    // and cume reaches exactly 1.0 on the cheapest
    val byPrio = res.groupBy(_.getString(1))
    val top = orders.groupBy("o_orderpriority")
      .agg(max("o_totalprice").as("mx")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((prio, rows) <- byPrio) {
      assert(rows.map(_.getDouble(4)).max == 1.0, prio)
      val topRow = rows.minBy(_.getDouble(3))
      assert(topRow.getDouble(3) == 0.0 && topRow.getInt(2) == 1, prio)
      val key = topRow.getLong(0)
      val price = orders.filter(col("o_orderkey") === key)
        .head().getAs[Double]("o_totalprice")
      assert(price == top(prio), prio)
    }
  }

  // ---- q97 random projection ----------------------------------------

  test("randomProjection is the md5-sign dot product, exactly") {
    val emb = Seq((0L, Array(1.0f, 2.0f, 3.0f), 0), (1L, Array(0.5f, -1.0f, 4.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val res = Similarity.randomProjection(emb, outDim = 4).collect()
    assert(res.length == 8)
    def sign(j: Int, i: Int): Double =
      if (md5hex(s"$j:$i").head < '8') 1.0 else -1.0
    for (r <- res) {
      val v = (if (r.getLong(0) == 0L) Array(1.0f, 2.0f, 3.0f)
               else Array(0.5f, -1.0f, 4.0f)).map(_.toDouble)
      val j = r.getInt(1)
      val exp = v.zipWithIndex.foldLeft(0.0) { case (acc, (x, i)) => acc + x * sign(j, i) }
      val expR = BigDecimal(exp).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == expR, s"vec ${r.getLong(0)} dim $j")
    }
  }

  test("randomProjection: native generator equals the composable literal-signs form") {
    // the plan form the SignProjectGenerator replaced, kept here as
    // the independent reference (hand-fold exactness is pinned above)
    val outDim = 16
    val signRows: Seq[Seq[Double]] = Seq.tabulate(outDim, 256) { (j, i) =>
      if (graft.functions.SignProjectGenerator.md5FirstHex(s"$j:$i") < '8') 1.0 else -1.0
    }
    val signs = typedlit(signRows)
    val v = col("v")
    val composed = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("rp",
        transform(sequence(lit(0), lit(outDim - 1)), j =>
          when(size(v) === 0, lit(0.0)).otherwise(
            round(aggregate(sequence(lit(1), size(v)), lit(0.0),
              (acc, i) => acc + element_at(v, i) *
                element_at(element_at(signs, j + lit(1)), i)), 4))))
      .select(col("vec_id"), posexplode(col("rp")).as(Seq("rp_dim", "rp_val")))
    val native = Similarity.randomProjection(Tables.embeddings(spark, sfDir))
    assert(native.exceptAll(composed).count() == 0 &&
      composed.exceptAll(native).count() == 0,
      "generator and composable projections diverge")
  }

  test("randomProjection survives an empty embedding (ANSI descending-sequence guard)") {
    val emb = Seq((7L, Array.empty[Float], 0)).toDF("vec_id", "embedding", "label")
    val res = Similarity.randomProjection(emb, outDim = 3).collect()
    assert(res.length == 3)
    assert(res.forall(_.getDouble(2) == 0.0)) // the empty sum
  }

  // ---- q142 k-means -------------------------------------------------

  test("kmeans: two planted blobs recover; converged distances exact") {
    val emb = Seq(
      (0L, Array(0.0f, 0.0f), 0), (1L, Array(10.0f, 10.0f), 0),
      (2L, Array(0.1f, 0.0f), 0), (3L, Array(10.0f, 10.1f), 0))
      .toDF("vec_id", "embedding", "label")
    val res = Similarity.kmeans(emb, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(res(0L)._1 == 1 && res(2L)._1 == 1)
    assert(res(1L)._1 == 2 && res(3L)._1 == 2)
    // centroids (0.05, 0) and (10, 10.05) → every dist² = 0.05² = 0.0025
    assert(res.values.forall(_._2 == 0.0025))
  }

  test("PQ: codebook-seed copies encode residual-free; ADC equals exact distance on them") {
    // dim-4 vectors; first 4 = distinct seeds (each subspace's first-k
    // init), the rest exact copies → per-subspace kmeans converges
    // onto the seed grid (residual 0 everywhere), so a vector's code
    // is its seed's slot and ADC to a query is the EXACT squared
    // distance between the seed vectors
    val seeds = Seq(0.0f, 1.0f, 2.0f, 3.0f).map(x => Array(x, x, x, x))
    val emb = (0L until 12L).map(i => (i, seeds((i % 4).toInt), 0))
      .toDF("vec_id", "embedding", "label")
    val codes = Similarity.pqCodes(emb, m = 2, k = 4, iters = 3).collect()
    assert(codes.length == 24)
    assert(codes.forall(_.getDouble(3) == 0.0), "seed copies must quantize losslessly")
    assert(codes.forall(r => r.getInt(2) == (r.getLong(0) % 4).toInt + 1),
      "code = the seed's 1-based init slot, in every subspace")
    val ann = Similarity.pqAnn(emb, m = 2, k = 4, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3))).toMap
    // q0's three zero-distance copies rank 1-3 by vec_id tie-break
    assert(ann((0L, 0L)) == (0.0, 1) && ann((0L, 4L)) == (0.0, 2) &&
      ann((0L, 8L)) == (0.0, 3))
    // next-nearest seed (all-ones): exact squared distance 4·1² = 4
    assert(ann((0L, 1L)) == (4.0, 4) && ann((0L, 5L)) == (4.0, 5))
    // lossless codes ⇒ ADC ≡ exact (same tie-breaks): recall is 1.0
    // for every panel query
    val rec = Similarity.pqRecall(emb, m = 2, k = 4, iters = 3).collect()
    assert(rec.length == 8 && rec.forall(_.getDouble(2) == 1.0), rec.mkString(";"))
  }

  test("PQ index: cached codes/ANN/recall equal the self-computing operators; reuse is a no-op") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val corpusDir = java.nio.file.Files.createTempDirectory("graft-pq-corpus").toString
    (0L until 40L).map(i => (i, Array.fill(6)(rnd.nextFloat()), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(corpusDir)
    val emb = spark.read.parquet(corpusDir)
    val base = java.nio.file.Files.createTempDirectory("graft-pq-base").toString
    val dir = Similarity.pqIndexDir(spark, corpusDir, base)
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
             what: String): Unit =
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what: cached and self-computed runs diverge")
    same(Similarity.pqCodesCached(emb, dir), Similarity.pqCodes(emb), "codes")
    same(Similarity.pqAnnCached(emb, dir), Similarity.pqAnn(emb), "ann")
    same(Similarity.pqRecallCached(emb, dir), Similarity.pqRecall(emb), "recall")
    assert(!Similarity.prebuildPqIndex(emb, dir), "second prebuild must reuse")
    spark.catalog.clearCache()
  }

  test("PQ: an odd dimension gives the last subspace the remainder, residual-free") {
    // dim 5, m 2 → subspaces of 2 and 3 dims; the split must cover
    // every dim exactly once (a dropped or doubled dim would leave a
    // nonzero residual or shift the codes off the seed slots)
    val seeds = Seq(0.0f, 1.0f, 2.0f, 3.0f).map(x => Array(x, x, x, x, x))
    val emb = (0L until 8L).map(i => (i, seeds((i % 4).toInt), 0))
      .toDF("vec_id", "embedding", "label")
    val codes = Similarity.pqCodes(emb, m = 2, k = 4, iters = 2).collect()
    assert(codes.length == 16)
    assert(codes.forall(_.getDouble(3) == 0.0))
    val ann = Similarity.pqAnn(emb, m = 2, k = 4, iters = 2, nQueries = 1, topK = 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // 5 dims now separate the seeds by 5·Δ²
    assert(ann(0L) == 0.0 && ann(4L) == 0.0 && ann(1L) == 5.0)
  }

  test("simplifiedSilhouette: tight separated blobs score near 1; scores are bounded") {
    val emb = Seq(
      (0L, Array(0.0f, 0.0f), 0), (1L, Array(10.0f, 10.0f), 0),
      (2L, Array(0.1f, 0.0f), 0), (3L, Array(10.0f, 10.1f), 0),
      (4L, Array(0.0f, 0.1f), 0), (5L, Array(10.1f, 10.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.simplifiedSilhouette(emb, k = 2, iters = 2).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    assert(r.length == 2 && r.map(_._2).sum == 6L)
    r.foreach { case (_, _, meanDist, s) =>
      assert(s > 0.95 && s <= 1.0, s"well-separated blobs must score near 1: $s")
      assert(meanDist < 0.1, s"tight blobs have tiny centroid distance: $meanDist")
    }
  }

  test("k-means cells cached twins: materialized cells ≡ self-computed q142/q155/q208") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-km").toString
    val dir = Similarity.kmCellsDir(spark, s"$sfDir/embeddings.parquet", base)
    assert(Similarity.prebuildKmeansCells(emb, dir), "first touch must build")
    assert(!Similarity.prebuildKmeansCells(emb, dir), "second touch must reuse")
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
             what: String): Unit =
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what: cached and self-computed runs diverge")
    same(Similarity.kmeansCached(emb, dir), Similarity.kmeans(emb),
      "q142 kmeans labels")
    same(Similarity.semDedupCached(emb, dir), Similarity.semDedup(emb),
      "q155 semDedup")
    same(Similarity.simplifiedSilhouetteCached(emb, dir),
      Similarity.simplifiedSilhouette(emb), "q208 silhouette")
  }

  test("simplifiedSilhouette on the corpus: every point counted, s in [0, 1]") {
    val emb = Tables.embeddings(spark, sfDir)
    val r = Similarity.simplifiedSilhouette(emb).collect()
    assert(r.map(_.getLong(1)).sum == emb.count())
    r.foreach { x =>
      assert(x.getDouble(3) >= 0.0 && x.getDouble(3) <= 1.0)
      assert(x.getDouble(2) >= 0.0)
    }
  }

  test("kmeans: argmin ties resolve to the lowest cluster id") {
    // after the update, centroids are 0.5 and 2.0; the point at 1.0
    // sits 0.25 from c1 vs 1.0 from c2 — but at init it is exactly
    // equidistant (d = (1, 1)) and must pick cluster 1
    val emb = Seq(
      (0L, Array(0.0f), 0), (1L, Array(2.0f), 0), (2L, Array(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val res = Similarity.kmeans(emb, k = 2, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(res == Map(0L -> 1, 2L -> 1, 1L -> 2))
  }

  test("kmeans: an emptied cluster keeps its centroid, ids stay stable") {
    // init: c1 = c2 = (5.0) (duplicate vectors), c3 = (100.0). Every
    // point near 5 ties between c1/c2 and drains to c1, so cluster 2
    // empties on the first update. c2 must KEEP (5.0) — not let c3
    // renumber into slot 2 — so vec 2 still lands in cluster 3, and
    // vecs 0/1 (exactly at 5.0) re-settle on the preserved c2 while
    // vec 3 stays with the updated c1 = avg(5, 5, 6) = 5.333333.
    val emb = Seq(
      (0L, Array(5.0f), 0), (1L, Array(5.0f), 0),
      (2L, Array(100.0f), 0), (3L, Array(6.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val res = Similarity.kmeans(emb, k = 3, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(res == Map(0L -> 2, 1L -> 2, 2L -> 3, 3L -> 1))
  }

  test("kmeans on the corpus: every vector assigned, clusters populated") {
    val embTable = Tables.embeddings(spark, sfDir)
    val res = Similarity.kmeans(embTable).collect()
    assert(res.length == embTable.count())
    val sizes = res.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(sizes.keySet.subsetOf((1 to 4).toSet) && sizes.size >= 2)
    assert(res.forall(_.getDouble(2) >= 0.0))
  }

  // ---- q155 SemDeDup ------------------------------------------------

  test("semDedup: keep-first-seen inside each cluster, both blobs pruned") {
    // init picks vecs 0 (blob A) and 1 (blob B); kmeans separates the
    // blobs, then every later member of a blob is condemned by its
    // lowest-id representative
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(-1.0f, 0.05f), 0),
      (2L, Array(0.999f, 0.01f), 0), (3L, Array(0.998f, 0.02f), 0),
      (4L, Array(-0.999f, 0.06f), 0))
      .toDF("vec_id", "embedding", "label")
    val res = Similarity.semDedup(emb, tau = 0.9, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("semDedup equals brute-force within-cluster pairs above the threshold") {
    val embTable = Tables.embeddings(spark, sfDir)
    val tau = 0.35
    val res = Similarity.semDedup(embTable, tau).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(res.forall { case (drop, (keep, _)) => keep < drop })
    val cluster = Similarity.kmeans(embTable).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = embTable.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray).toMap
    // same sequential fold the HOF cosine runs → bit-identical doubles
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).foldLeft(0.0)(_ + _)
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val expected = vecs.keys.toSeq.sorted.flatMap { j =>
      val hits = vecs.keys.toSeq.sorted
        .filter(i => i < j && cluster(i) == cluster(j))
        .map(i => (i, cos(vecs(i), vecs(j))))
        .filter(_._2 >= tau)
      if (hits.isEmpty) None
      else Some(j -> (hits.map(_._1).min,
        math.floor(hits.map(_._2).max * 1e4 + 0.5) / 1e4))
    }.toMap
    assert(res == expected)
  }

  // ---- q98 normalize text -------------------------------------------

  test("normalizeText folds whitespace, strips non-ASCII, lowercases") {
    val docs = Seq(
      (1L, "  Héllo\t WORLD  x  "),
      (2L, ""),
      (3L, "already clean")
    ).toDF("doc_id", "text")
    val res = TextAnalysis.normalizeText(docs).collect()
    val byId = res.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(2) == "hllo world x".length)
    assert(byId(1L).getString(3) == md5hex("hllo world x"))
    assert(byId(2L).getInt(1) == 0 && byId(2L).getInt(2) == 0)
    assert(byId(2L).getString(3) == md5hex(""))
    assert(byId(3L).getString(3) == md5hex("already clean"))
  }

  // ---- q99 char entropy ---------------------------------------------

  test("charEntropy: hand-checked values, including the empty-text row") {
    val docs = Seq(
      (1L, "aab"),  // runs a:2 b:1 → ln(3) − (2ln2)/3
      (2L, ""),     // the ANSI guard fixture: must not throw
      (3L, "aaaa"), // one run → entropy 0
      (4L, "abcd")  // uniform → ln(4)
    ).toDF("doc_id", "text")
    val res = TextAnalysis.charEntropy(docs).collect()
    val byId = res.map(r => r.getLong(0) -> r).toMap
    def ent(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(1L).getInt(1) == 3 && byId(1L).getInt(2) == 2)
    assert(byId(1L).getDouble(3) == ent(math.log(3) - 2 * math.log(2) / 3))
    assert(byId(2L).getInt(1) == 0 && byId(2L).getInt(2) == 0 && byId(2L).isNullAt(3))
    assert(byId(3L).getInt(2) == 1 && byId(3L).getDouble(3) == 0.0)
    assert(byId(4L).getDouble(3) == ent(math.log(4)))
  }

  test("charEntropy runs over the real corpus without ANSI errors") {
    val docs = Tables.documents(spark, sfDir)
    val n = TextAnalysis.charEntropy(docs).count()
    assert(n == docs.count())
  }

  // ---- q100 chunk documents -----------------------------------------

  test("chunkDocuments: window starts, sizes, and fingerprints are exact") {
    val tokens = (1 to 100).map(i => s"t$i")
    val docs = Seq((1L, tokens.mkString(" ")), (2L, "solo")).toDF("doc_id", "text")
    val res = TrainingData.chunkDocuments(docs).collect()
    val d1 = res.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((0, 64), (1, 52), (2, 4))) // starts 1, 49, 97 over 100 tokens
    assert(d1.head.getString(3) == md5hex(tokens.take(64).mkString(" ")))
    assert(d1.last.getString(3) == md5hex(tokens.drop(96).mkString(" ")))
    val d2 = res.filter(_.getLong(0) == 2L)
    assert(d2.map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq ==
      Seq((0, 1, md5hex("solo"))))
  }

  // ---- q101 latest per key ------------------------------------------

  test("latestPerKey agrees with the row_number window formulation") {
    val res = TrainingData.latestPerKey(events).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val ref = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(res == ref)
    assert(res.size == events.select("user_id").distinct().count())
  }

  // ---- q188 incremental view maintenance -----------------------------

  test("applyHourlyDelta: merged partials equal the full recompute for any split") {
    import org.apache.spark.sql.functions._
    val full = Aggregates.applyHourlyDelta(
      Aggregates.hourlyPartials(events.limit(0)), events).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    for (mod <- Seq(2L, 7L, 10L)) {
      val inc = Aggregates.applyHourlyDelta(
        Aggregates.hourlyPartials(events.filter(col("event_id") % mod =!= 0)),
        events.filter(col("event_id") % mod === 0)).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(inc == full, s"split mod $mod diverged from the full recompute")
    }
    // deltas compose when the caller keeps the PARTIALS (the stored
    // form), not the rounded read view — monoid associativity
    val composed = Aggregates.applyHourlyDelta(
      Aggregates.hourlyPartials(events.filter(col("event_id") % 3 =!= 2)),
      events.filter(col("event_id") % 3 === 2)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(composed == full)
  }

  // ---- q189 right-to-be-forgotten audit ------------------------------

  test("forgetUsersAudit: self-proving scrub — residual zero, counts reconcile") {
    import org.apache.spark.sql.functions._
    val forget = events.filter(col("user_id") % 53 === 0)
      .select("user_id").distinct()
      // a requested user that has no events: requested > matched, still clean
      .unionByName(spark.range(1).select(lit(999999L).as("user_id")))
    val r = Aggregates.forgetUsersAudit(events, forget).collect()
    assert(r.length == 1)
    val row = r.head
    val (before, removed, after) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(before == events.count())
    assert(after + removed == before)
    assert(row.getLong(3) == row.getLong(4) + 1, "the absent user is requested, not matched")
    assert(row.getLong(5) == 0L && row.getInt(6) == 1, row)
  }

  // ---- q185 source fingerprints --------------------------------------

  test("sourceFingerprints: invariant under repartition; one changed row flips one source") {
    val docs = Tables.documents(spark, sfDir)
    val base = Aggregates.sourceFingerprints(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // order-free: identical after a reshuffle into a different layout
    val reshuffled = Aggregates.sourceFingerprints(docs.repartition(7)).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(base == reshuffled, "fingerprint must not depend on partitioning")
    // mutate one row's text → exactly that source's xor moves
    import org.apache.spark.sql.functions._
    val mutated = docs.withColumn("text",
      when(col("doc_id") === 0L, concat(col("text"), lit(" x")))
        .otherwise(col("text")))
    val changedSource = docs.filter(col("doc_id") === 0L)
      .select("source").head().getString(0)
    val after = Aggregates.sourceFingerprints(mutated).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(after(changedSource)._2 != base(changedSource)._2)
    assert(after.filter(_._1 != changedSource) ==
      base.filter(_._1 != changedSource))
    assert(base.values.map(_._1).sum == docs.count())
  }

  // ---- q225 F2 self-join size estimation ------------------------------

  test("selfJoinSizeEstimate: exact F2 is the sum of squared key counts") {
    import spark.implicits._
    // counts 3/2/1 → F2 = 9 + 4 + 1 = 14; the estimate is the scaled
    // sample sum, so it is a multiple of the rate by construction
    val li = (Seq.fill(3)(101L) ++ Seq.fill(2)(202L) ++ Seq(303L))
      .zipWithIndex.map { case (pk, i) => (i.toLong, pk) }
      .toDF("l_orderkey", "l_partkey")
    val r = Aggregates.selfJoinSizeEstimate(li).head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 14L)))
    assert(r.getLong(3) % 10 == 0 && r.getLong(2) <= 3)
  }

  test("selfJoinSizeEstimate on the corpus: ~10% key sample, bounded error") {
    val li = Tables.lineitem(spark, sfDir)
    val r = Aggregates.selfJoinSizeEstimate(li).head()
    val (nKeys, exact, nSampled, est) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(exact >= li.count(), "F2 >= n always (c^2 >= c)")
    assert(nSampled > 0 && nSampled < nKeys)
    // md5 is uniform: the 1-in-10 key sample lands near 10%
    assert(math.abs(nSampled.toDouble / nKeys - 0.1) < 0.05)
    assert(est > 0 && r.getDouble(4) < 1.0, "order-of-magnitude agreement")
  }
}
