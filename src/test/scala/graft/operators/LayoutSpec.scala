package graft.operators

import graft.SparkSpec
import graft.plans.PlanAudit

/** Properties of the storage-layout operators: Z-order actually bounds
  * the second dimension's per-file span, and compaction packing is
  * exhaustive and partition-scoped. */
class LayoutSpec extends SparkSpec {

  test("zorder layout prunes the second dimension; linear does not") {
    val rows = Layout.zorderStats(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val (z, l) = (rows("zorder"), rows("linear"))
    // both layouts partition the same rows into the same file budget
    assert(z.getAs[Long]("n_rows") == l.getAs[Long]("n_rows"))
    assert(z.getAs[Long]("n_files") <= Layout.NFiles &&
      l.getAs[Long]("n_files") <= Layout.NFiles)
    // the point of Z-order: total suppkey coverage (what a suppkey
    // filter would have to scan) collapses vs the partkey-linear layout,
    // where every file spans ~the full suppkey range
    assert(z.getAs[Long]("sp_coverage") < l.getAs[Long]("sp_coverage") / 2,
      s"zorder sp_coverage ${z.getAs[Long]("sp_coverage")} should be far " +
        s"below linear ${l.getAs[Long]("sp_coverage")}")
    // ...while partkey coverage degrades only boundedly (each file's
    // span can at most double the ideal width times the file count)
    assert(z.getAs[Long]("pk_coverage") < 8 * l.getAs[Long]("pk_coverage"))
  }

  test("compaction bins: exhaustive, month-scoped, date-contiguous") {
    val bins = Layout.compactionBins(spark, sf).collect()
    // every order-date file lands in exactly one bin
    val nDays = graft.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate"))).distinct().count()
    assert(bins.map(_.getAs[Long]("n_files")).sum == nDays)
    // bins never span months and date ranges are consistent
    bins.foreach { b =>
      import java.time.LocalDate
      val month = LocalDate.parse(b.getAs[String]("month"))
      val lo = LocalDate.parse(b.getAs[String]("min_day"))
      val hi = LocalDate.parse(b.getAs[String]("max_day"))
      assert(!lo.isAfter(hi))
      assert(lo.withDayOfMonth(1) == month && hi.withDayOfMonth(1) == month)
    }
    // next-fit invariant: a bin only closes once the month's cumulative
    // volume has crossed its target boundary, so through every non-final
    // bin k the running total is >= (k+1) * target
    bins.groupBy(_.getAs[String]("month")).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_.getAs[Long]("bin"))
      var cum = 0L
      sorted.init.zipWithIndex.foreach { case (b, k) =>
        cum += b.getAs[Long]("total_rows")
        assert(cum >= (k + 1) * Layout.CompactionTarget,
          s"bin $k closed before the cumulative target")
      }
    }
  }

  test("layout queries audit clean of scale-killers") {
    PlanAudit.assertScaleSafe(Layout.zorderStats(spark, sf))
    PlanAudit.assertScaleSafe(Layout.compactionBins(spark, sf))
    PlanAudit.assertScaleSafe(Layout.rangeBoundaries(spark, sf))
    spark.catalog.clearCache()
  }

  test("range boundaries: splits tile the key space with balanced depth") {
    val rows = Layout.rangeBoundaries(spark, sf).collect()
      .sortBy(_.getAs[Int]("split_id"))
    val n = graft.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == n)
    // key ranges are ordered and non-overlapping across splits
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_key") <= b.getAs[Long]("min_key"))
      case _ =>
    }
    // equi-depth within a generous band (ties on the key grid distort)
    val target = n / Layout.RangeSplits
    rows.foreach(r => assert(r.getAs[Long]("n_rows") <= 3 * target &&
      r.getAs[Long]("n_rows") >= target / 3,
      s"split ${r.getAs[Int]("split_id")} holds ${r.getAs[Long]("n_rows")}"))
    spark.catalog.clearCache()
  }
}
