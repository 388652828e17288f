package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side machinery that makes a
  * 100 TB table cheap to READ — multi-dimensional Z-order clustering
  * keys and the file-level min/max statistics manifest that data
  * skipping prunes against. The engine's bucketed writers
  * (engine/ParquetSink.scala) co-locate joins; these two cover the
  * other layout axis: range locality for selective scans. Both are
  * pure integer arithmetic, so the DuckDB oracles are bit-exact.
  */
object Layout {

  /** Morton/Z-order interleave of the low `bits` of two long columns:
    * bit i of a lands at output bit 2i+1, bit i of b at 2i. Sorting
    * by this key makes ranges of BOTH dimensions spatially local, so
    * a file-level min/max manifest prunes selective predicates on
    * EITHER column — the standard multi-dimension clustering trick
    * (a plain sort by (a, b) only localizes the leading column).
    *
    * The interleave unrolls driver-side into a fixed OR-chain of
    * shift/mask literals — one codegen'd expression, no per-row
    * loop, no UDF (the q97 lesson: constants belong in the plan).
    */
  def zorderKey(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 16, "zorderKey supports 1..16 bits per dim")
    val ba = pmod(a, lit(1L << bits))
    val bb = pmod(b, lit(1L << bits))
    (0 until bits).map { i =>
      val hi = shiftleft(shiftrightunsigned(ba, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val lo = shiftleft(shiftrightunsigned(bb, i).bitwiseAND(lit(1L)), 2 * i)
      hi.bitwiseOR(lo)
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order layout audit over lineitem (part × supplier): assign
    * every row its interleaved key, cut the key space into
    * `nBuckets` equal z-ranges (the "files" a clustered write would
    * produce), and report each range's row count plus the min/max
    * span of BOTH source dimensions — the exact statistics a skipping
    * manifest would store, demonstrating that each z-run bounds both
    * columns at once.
    *
    * One narrow 2-column scan → projection → single partial-
    * aggregated groupBy on the bucket id: the audit costs one
    * shuffle of #buckets rows regardless of table size.
    */
  def zorderLayout(lineitem: DataFrame, bits: Int = 8,
                   nBuckets: Int = 64): DataFrame = {
    val span = (1L << (2 * bits)) / nBuckets
    lineitem
      .select(
        pmod(col("l_partkey"), lit(1L << bits)).as("bx"),
        pmod(col("l_suppkey"), lit(1L << bits)).as("by"),
        zorderKey(col("l_partkey"), col("l_suppkey"), bits).as("z"))
      // integer div, not double-divide-then-cast: Spark's double→long
      // cast truncates while DuckDB's rounds — div sidesteps the trap
      .withColumn("zbucket", expr(s"z div $span"))
      .groupBy("zbucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min("bx").as("min_bx"), max("bx").as("max_bx"),
        min("by").as("min_by"), max("by").as("max_by"))
      .orderBy("zbucket")
  }

  /** File-statistics manifest + pruning simulation over orders:
    * bucket the table by calendar month (the natural write partition
    * of an append-only fact table), record per-bucket count and
    * min/max of the date and price columns — the manifest a skipping
    * reader consults — and flag which buckets a
    * `totalprice ∈ [priceLo, priceHi]` predicate would actually have
    * to scan (a bucket survives iff its [min,max] price range
    * intersects the predicate range). The `scanned` column IS the
    * skipping decision: at 100 TB the reader opens only those files.
    *
    * One partial-aggregated groupBy on the month key; the manifest
    * is #months rows — driver-safe forever. Pruning is evaluated on
    * the manifest, never the data.
    */
  def statsManifest(orders: DataFrame, priceLo: Double = 100000.0,
                    priceHi: Double = 150000.0): DataFrame = {
    orders
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("bucket"),
        col("o_orderdate"), col("o_totalprice"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("o_orderdate")).cast("date").as("min_date"),
        max(col("o_orderdate")).cast("date").as("max_date"),
        // raw min/max — exact input doubles, bit-identical across
        // engines (rounding here would only introduce boundary risk)
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
      .withColumn("scanned",
        (col("max_price") >= priceLo && col("min_price") <= priceHi)
          .cast("int"))
      .orderBy("bucket")
  }

  /** Compaction planner — the answer to the small-files problem an
    * append-per-day ingest accumulates: model each order day as one
    * written file (rows + a deterministic byte estimate), then bin
    * consecutive files into target-sized compaction groups by
    * cumulative-byte division. Consecutive-run binning (not arbitrary
    * bin packing) is deliberate: it preserves the date sort order, so
    * compacted files keep their min/max date locality and the q133
    * skipping manifest stays selective after the rewrite.
    *
    * The per-file manifest is #days rows — metadata, not data — so
    * the one ordered window (the cumulative sum) runs over a frame a
    * driver could hold outright; the only data-sized work is the
    * per-day aggregate, which partial-aggregates before its shuffle.
    * Byte estimates are integer arithmetic end to end.
    */
  def compactionPlan(orders: DataFrame,
                     targetBytes: Long = 65536L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = orders
      .select(col("o_orderdate").cast("date").as("day"),
        (length(col("o_orderstatus")) + length(col("o_orderpriority")) + 96L)
          .cast("long").as("row_bytes"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_rows"), sum("row_bytes").as("bytes"))
    val byDay = Window.partitionBy().orderBy(col("day"))
    files
      // bin by the running total BEFORE this file: a file never
      // splits, and groups tile the day axis in order
      .withColumn("cum_before",
        coalesce(sum(col("bytes")).over(byDay.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("grp", expr(s"cum_before div ${targetBytes}L"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_files"),
        sum("n_rows").as("n_rows"),
        sum("bytes").as("group_bytes"),
        min("day").as("first_day"), max("day").as("last_day"),
        sum(when(col("bytes") < targetBytes / 8, 1L).otherwise(0L))
          .as("n_undersized"))
      .orderBy("grp")
  }
}
