package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Storage-layout optimization operators — the table-maintenance side of
  * a 100 TB lakehouse that the query operators rely on: multi-dimension
  * clustering (Z-order) so file min/max statistics prune on EVERY filter
  * column, and small-file compaction planning (the daily-ingest
  * one-file-per-day problem). Both are measured, not just performed: the
  * queries emit the layout-quality statistics an OPTIMIZE job would log
  * (reference keeps per-sync file bookkeeping in etl/flows/sync_daily.py
  * and object-store listings in storage/s3_manager.py — these operators
  * are the layout-planning analyses over exactly that bookkeeping).
  *
  * Determinism: Z-values are pure integer bit interleaves written as
  * div/mod arithmetic (portable to the DuckDB oracle verbatim), bucket
  * assignment is equal-width integer range splitting against exact
  * min/max anchors, and compaction is next-fit by date with an integer
  * running sum — every number replays bit-for-bit.
  */
object Layout {

  /** Bits per dimension in the Z-value interleave. 20 bits covers keys
    * to ~1M (TPC-H partkey at SF ≈ 5); the interleaved value stays
    * < 2^40, safely inside BIGINT for the ×NFiles bucket arithmetic. */
  val ZBits = 20

  /** Simulated file count for layout statistics. */
  val NFiles = 64

  /** Target rows per compaction bin (the "target file size"). */
  val CompactionTarget = 50L

  /** Bit-interleave of two non-negative BIGINT dims as pure div/mod
    * arithmetic — dim-a bits land on even positions, dim-b on odd. The
    * same text (with `//` for `div`) runs in DuckDB, which is what keeps
    * the oracle exact. Spark folds this 2·[[ZBits]]-term sum into one
    * codegen'd projection — no UDF, no per-row allocation. */
  private def zExprSql(a: String, b: String, intDiv: String): String =
    (0 until ZBits).map { i =>
      val (pa, pb) = (1L << (2 * i), 1L << (2 * i + 1))
      s"($a $intDiv ${1L << i} % 2) * $pa + ($b $intDiv ${1L << i} % 2) * $pb"
    }.mkString(" + ")

  private def zCol(a: String, b: String): Column = expr(zExprSql(a, b, "div"))

  /** Layout statistics: cluster lineitem by Z-order over
    * (l_partkey, l_suppkey) versus linearly by l_partkey alone, split
    * each layout into [[NFiles]] equal-width key-range "files", and
    * report the summed per-file min/max coverage of BOTH dimensions —
    * the exact quantity a min/max-pruning scan planner consults. Linear
    * layout gives perfect partkey coverage but each file spans the full
    * suppkey range (no pruning on the second filter column); Z-order
    * trades a little partkey locality for bounded spans on both.
    *
    * Scale: one 2-column scan, one tiny global min/max anchor
    * (broadcast), two map-side-combinable aggregates over ≤ NFiles
    * groups. Bucketing is arithmetic on the Z-value — at 100 TB the real
    * OPTIMIZE ZORDER write is a range-partition-by-z sort, and this
    * statistic predicts its benefit without performing the rewrite. */
  def zorderStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sp"))
      .withColumn("z", zCol("pk", "sp"))
    val anchors = li.agg(min("z").as("zmin"), max("z").as("zmax"),
      min("pk").as("pkmin"), max("pk").as("pkmax"))
    val bucketed = li.crossJoin(broadcast(anchors))
      .select(col("pk"), col("sp"),
        expr(s"(z - zmin) * $NFiles div (zmax - zmin + 1)").as("zfile"),
        expr(s"(pk - pkmin) * $NFiles div (pkmax - pkmin + 1)").as("lfile"))
      .persist()
    def layoutAgg(file: String, layout: String): DataFrame =
      bucketed.groupBy(col(file).as("file"))
        .agg(count(lit(1)).as("n_rows"),
          (max("pk") - min("pk") + 1).as("pk_span"),
          (max("sp") - min("sp") + 1).as("sp_span"))
        .agg(count(lit(1)).as("n_files"), sum("n_rows").as("n_rows"),
          sum("pk_span").as("pk_coverage"), sum("sp_span").as("sp_coverage"))
        .select(lit(layout).as("layout"), col("n_files"), col("n_rows"),
          col("pk_coverage"), col("sp_coverage"))
    layoutAgg("zfile", "zorder").unionAll(layoutAgg("lfile", "linear"))
  }

  /** Compaction plan for the daily-ingest small-file problem: one
    * "file" per order date, packed next-fit (date order, so date-range
    * pruning survives compaction) into bins of [[CompactionTarget]]
    * rows, scoped WITHIN each month partition — real compaction never
    * merges across table partitions. Emits the per-bin manifest an
    * OPTIMIZE job would execute: file count, rows, fill ratio, covered
    * date range.
    *
    * Scale: the file list is calendar-bounded (one row per day — ~2.4k
    * rows per 6.5 years regardless of data volume), so the per-month
    * running-sum window is over a bounded, well-partitioned table; the
    * only data-volume-sized step is the daily count aggregate, which is
    * map-side combinable. */
  def compactionBins(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("size"))
      .withColumn("month", trunc(col("day"), "month"))
    files
      .withColumn("bin",
        expr(s"(sum(size) OVER (PARTITION BY month ORDER BY day " +
          s"ROWS UNBOUNDED PRECEDING) - size) div $CompactionTarget"))
      .groupBy("month", "bin")
      .agg(count(lit(1)).as("n_files"), sum("size").as("total_rows"),
        min("day").as("min_day"), max("day").as("max_day"))
      // dates travel as ISO strings: the comparison gate normalizes
      // DATE differently per engine, strings are bit-stable
      .select(date_format(col("month"), "yyyy-MM-dd").as("month"),
        col("bin"), col("n_files"), col("total_rows"),
        expr(s"total_rows * 1000 div $CompactionTarget").as("fill_milli"),
        date_format(col("min_day"), "yyyy-MM-dd").as("min_day"),
        date_format(col("max_day"), "yyyy-MM-dd").as("max_day"))
  }

  /** Range splits for [[rangeBoundaries]]. */
  val RangeSplits = 16

  /** Equi-depth range-partition plan over the customer join key — the
    * boundary table a sorted/range-bucketed write (or a range-shuffle
    * planner) needs so every output partition holds ~1/N of the rows
    * regardless of key skew. ONE bounded `percentile` aggregate
    * computes all interior boundaries; rows then assign to splits by a
    * broadcast edge-array scan (the o8 decile idiom) and one groupBy
    * emits the plan manifest: per split, its exact row count and key
    * range. At 100 TB the percentile aggregate is the only full-data
    * pass and it is map-side combinable. */
  def rangeBoundaries(spark: SparkSession, dir: String,
                      splits: Int = RangeSplits): DataFrame = {
    val keys = Tables.orders(spark, dir).select(col("o_custkey").as("k"))
    val edges = keys.agg(percentile(col("k"),
      array((1 until splits).map(i => lit(i.toDouble / splits)): _*)).as("edges"))
    keys.crossJoin(broadcast(edges))
      .select(col("k"),
        size(filter(col("edges"), e => col("k").cast("double") > e))
          .cast("int").as("split_id"))
      .groupBy("split_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))
  }

  // -------------------------------------------------------------------
  // Registration
  // -------------------------------------------------------------------

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "layout_zorder_stats" -> ((s, d) => zorderStats(s, d)),
    "layout_compaction_bins" -> ((s, d) => compactionBins(s, d)),
    "layout_range_boundaries" -> ((s, d) => rangeBoundaries(s, d)))

  private def rangeBoundariesOracle: String = {
    val qs = (1 until RangeSplits)
      .map(i => s"quantile_cont(k, $i.0/$RangeSplits)").mkString(", ")
    s"""WITH kk AS (SELECT o_custkey AS k FROM orders),
       |e AS (SELECT [$qs] AS edges FROM kk),
       |a AS (
       |  SELECT kk.k,
       |         CAST(len(list_filter(e.edges, b -> CAST(kk.k AS DOUBLE) > b))
       |           AS INT) AS split_id
       |  FROM kk CROSS JOIN e)
       |SELECT split_id, count(*) AS n_rows,
       |       min(k) AS min_key, max(k) AS max_key
       |FROM a GROUP BY 1""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "layout_range_boundaries" -> rangeBoundariesOracle,
    "layout_zorder_stats" -> s"""WITH li AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sp,
      |         ${zExprSql("l_partkey", "l_suppkey", "//")} AS z
      |  FROM lineitem),
      |anchors AS (SELECT min(z) AS zmin, max(z) AS zmax,
      |                   min(pk) AS pkmin, max(pk) AS pkmax FROM li),
      |bucketed AS MATERIALIZED (
      |  SELECT pk, sp,
      |         (z - zmin) * $NFiles // (zmax - zmin + 1) AS zfile,
      |         (pk - pkmin) * $NFiles // (pkmax - pkmin + 1) AS lfile
      |  FROM li CROSS JOIN anchors),
      |zf AS (SELECT zfile, count(*) AS n_rows,
      |              max(pk) - min(pk) + 1 AS pk_span,
      |              max(sp) - min(sp) + 1 AS sp_span
      |       FROM bucketed GROUP BY 1),
      |lf AS (SELECT lfile, count(*) AS n_rows,
      |              max(pk) - min(pk) + 1 AS pk_span,
      |              max(sp) - min(sp) + 1 AS sp_span
      |       FROM bucketed GROUP BY 1)
      |SELECT 'zorder' AS layout, count(*) AS n_files,
      |       CAST(sum(n_rows) AS BIGINT) AS n_rows,
      |       CAST(sum(pk_span) AS BIGINT) AS pk_coverage,
      |       CAST(sum(sp_span) AS BIGINT) AS sp_coverage FROM zf
      |UNION ALL
      |SELECT 'linear', count(*), CAST(sum(n_rows) AS BIGINT),
      |       CAST(sum(pk_span) AS BIGINT), CAST(sum(sp_span) AS BIGINT)
      |FROM lf""".stripMargin,
    "layout_compaction_bins" -> s"""WITH files AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS size
      |  FROM orders GROUP BY 1),
      |packed AS (
      |  SELECT day, size, date_trunc('month', day) AS month,
      |         CAST((sum(size) OVER (PARTITION BY date_trunc('month', day)
      |            ORDER BY day ROWS UNBOUNDED PRECEDING) - size)
      |           // $CompactionTarget AS BIGINT) AS bin
      |  FROM files)
      |SELECT strftime(month, '%Y-%m-%d') AS month, bin,
      |       count(*) AS n_files,
      |       CAST(sum(size) AS BIGINT) AS total_rows,
      |       CAST(sum(size) * 1000 // $CompactionTarget AS BIGINT)
      |         AS fill_milli,
      |       strftime(min(day), '%Y-%m-%d') AS min_day,
      |       strftime(max(day), '%Y-%m-%d') AS max_day
      |FROM packed GROUP BY 1, 2""".stripMargin)
}
