package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The declarative constraint suite counts violations exactly and runs
  * as one aggregation pass. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  test("planted violations are counted per constraint; clean checks pass") {
    val df = Seq(
      (Some(1L), 10.0, "O"), (Some(2L), -5.0, "F"),
      (None, 3.0, "O"), (Some(4L), -1.0, "X"))
      .toDF("k", "price", "status")
    val out = validate(df, Seq(
      Check("no_null_k", countWhere(col("k").isNull)),
      Check("price_nonneg", countWhere(col("price") < 0)),
      Check("status_vocab", countWhere(!col("status").isin("O", "F", "P"))),
      Check("never_fails", countWhere(lit(false)))))
      .collect()
      .map(r => r.getAs[String]("constraint") ->
        ((r.getAs[Long]("n_violations"), r.getAs[Long]("n_checked"),
          r.getAs[Boolean]("pass")))).toMap
    assert(out("no_null_k") == ((1L, 4L, false)))
    assert(out("price_nonneg") == ((2L, 4L, false)))
    assert(out("status_vocab") == ((1L, 4L, false)))
    assert(out("never_fails") == ((0L, 4L, true)))
  }

  test("empty input: zero violations, zero checked, all pass") {
    val df = Seq.empty[(Long, Double)].toDF("k", "price")
    val out = validate(df, Seq(
      Check("no_null_k", countWhere(col("k").isNull)))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_violations") == 0L)
    assert(out.head.getAs[Long]("n_checked") == 0L)
    assert(out.head.getAs[Boolean]("pass"))
  }

  test("the registered star-schema suite is clean on the driver's data") {
    val rows = DataQuality.constraintReport(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(r.getAs[Boolean]("pass"),
      s"constraint ${r.getAs[String]("constraint")} has " +
        s"${r.getAs[Long]("n_violations")} violations"))
  }

  test("column profile: one row per column, counts consistent in one pass") {
    val rows = DataQuality.columnProfile(spark, sf).collect()
    assert(rows.map(_.getAs[String]("col_name")).toSet ==
      Set("o_orderstatus", "o_orderpriority", "o_custkey"))
    val nOrders = graft.Tables.orders(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nOrders)
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Long]("n_distinct") > 0L &&
        r.getAs[Long]("n_distinct") <= nOrders)
      assert(r.getAs[String]("min_val") <= r.getAs[String]("max_val"))
      assert(r.getAs[Long]("sum_len") >= nOrders) // every value >= 1 char
    }
  }

  test("column entropy: exact milli-log2 identity on crafted columns, " +
    "constant -> 0, all-distinct -> normalized 1000") {
    def l2m(x: Long): Long = {
      val b = 64 - java.lang.Long.numberOfLeadingZeros(x)
      (b - 1) * 1000L + x * 1000L / (1L << (b - 1)) - 1000L
    }
    // const: one value; uni: 8 distinct over 8 rows; skew: 6+1+1
    val df = (0 until 8).map(i =>
      ("k", i.toLong, if (i < 6) "a" else if (i == 6) "b" else "c"))
      .toDF("const_c", "uni_c", "skew_c")
    val got = DataQuality.columnEntropyOf(df, Seq("const_c", "uni_c", "skew_c"))
      .collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("entropy_milli_bits"),
          if (r.isNullAt(r.fieldIndex("norm_entropy_milli"))) -1L
          else r.getAs[Long]("norm_entropy_milli")))).toMap
    // constant column: H = L(8) - 8*L(8)/8 = 0; ndv=1 -> norm NULL (-1)
    assert(got("const_c") == ((8L, 1L, 0L, -1L)))
    // all-distinct: s_nl = 0 -> H = L(8) = 3000 milli-bits, norm = 1000
    assert(got("uni_c") == ((8L, 8L, 3000L, 1000L)))
    // skew 6/1/1: H = L(8) - (6*L(6) + 0 + 0) div 8, replayed exactly
    val hSkew = l2m(8) - 6 * l2m(6) / 8
    assert(got("skew_c") ==
      ((8L, 3L, hSkew, hSkew * 1000 / l2m(3))), s"got ${got("skew_c")}")

    // registered profile: one row per column, entropies within [0, L(N)]
    val real = DataQuality.columnEntropy(spark, sf).collect()
    assert(real.length == 3)
    real.foreach { r =>
      val h = r.getAs[Long]("entropy_milli_bits")
      assert(h >= 0L && h <= l2m(r.getAs[Long]("n_rows")))
    }
  }

  test("FD audit: crafted hold/fail counts exact; registered verdicts " +
    "match the schema's true dependencies") {
    val df = Seq(
      ("holds", "a", "1"), ("holds", "a", "1"), ("holds", "b", "2"),
      ("fails", "a", "1"), ("fails", "a", "2"), ("fails", "a", "1"),
      ("fails", "b", "5"))
      .toDF("fd", "dv", "pv")
    val got = DataQuality.fdAuditOf(df).collect()
      .map(r => r.getAs[String]("fd") ->
        ((r.getAs[Long]("n_det_values"), r.getAs[Long]("n_violating_det"),
          r.getAs[Long]("max_dep_per_det"),
          r.getAs[Long]("n_rows_in_violation"),
          r.getAs[Long]("holds")))).toMap
    assert(got("holds") == ((2L, 0L, 1L, 0L, 1L)))
    assert(got("fails") == ((2L, 1L, 2L, 3L, 0L)))

    // registered suite: the two key-determined FDs hold, the two
    // many-to-one-violating ones fail
    val real = DataQuality.fdAudit(spark, sf).collect()
      .map(r => r.getAs[String]("fd") -> r.getAs[Long]("holds")).toMap
    assert(real("orders: o_orderkey -> o_custkey") == 1L)
    assert(real("customer: c_custkey -> c_nationkey") == 1L)
    assert(real("orders: o_custkey -> o_orderpriority") == 0L)
    assert(real("lineitem: l_orderkey -> l_suppkey") == 0L)
  }

  test("referential integrity: crafted orphans counted exactly; the " +
    "star schema's five FK edges are orphan-free") {
    val child = Seq(1L, 2L, 3L, 3L, 9L, 9L, 8L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = DataQuality.refIntegrityOf("t", child, parent).head()
    assert(row.getAs[Long]("n_child_rows") == 7L)
    assert(row.getAs[Long]("n_orphan_rows") == 3L)
    assert(row.getAs[Long]("n_orphan_keys") == 2L)

    val real = DataQuality.refIntegrity(spark, sf).collect()
    assert(real.length == 5)
    real.foreach { r =>
      assert(r.getAs[Long]("n_child_rows") > 0L)
      assert(r.getAs[Long]("n_orphan_rows") == 0L,
        s"${r.getAs[String]("fk_edge")} has orphans")
      assert(r.getAs[Long]("n_orphan_keys") == 0L)
    }
  }

  test("Benford audit: digits 1-9 partition the corpus, per-mille sane") {
    val rows = DataQuality.benfordDigits(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    assert(rows.map(_.getAs[Long]("n")).sum ==
      graft.Tables.orders(spark, sf).count())
    val pm = rows.map(_.getAs[Long]("p_mille")).sum
    assert(pm > 1000L - rows.length && pm <= 1000L)
    // the literal expectation table is the Benford distribution
    assert(rows.forall(r => r.getAs[Int]("expected_mille") ==
      math.floor(1000 * math.log10(1.0 + 1.0 / r.getAs[Int]("digit"))).toInt))
  }

  test("key-skew profile matches a direct recomputation") {
    val row = DataQuality.keySkew(spark, sf).collect().head
    val counts = graft.Tables.orders(spark, sf)
      .groupBy("o_custkey").count().collect().map(_.getAs[Long]("count"))
    val n = counts.sum
    assert(row.getAs[Long]("n_rows") == n)
    assert(row.getAs[Long]("n_keys") == counts.length.toLong)
    assert(row.getAs[Long]("max_key_rows") == counts.max)
    assert(row.getAs[Long]("top_share_mille") == counts.max * 1000 / n)
    assert(row.getAs[Long]("collision_micro") ==
      counts.map(c => c * (c - 1)).sum * 1000000 / (n * (n - 1)))
  }

  test("drift PSI: identical distributions contribute zero, a shifted one " +
    "is strictly positive, and shares conserve") {
    import spark.implicits._
    val refB = (1L to 300L).map(i => i % 4).toDF("bucket")
    val same = DataQuality.driftPsiOf(refB, refB).collect()
    assert(same.forall(_.getAs[Long]("contrib_micro") == 0L))
    // mass moves from bucket 0 to bucket 3 -> both ends contribute > 0
    // ((p-q) and log(p/q) always share a sign, so PSI terms are >= 0)
    val curB = (1L to 300L).map(i => if (i % 4 == 0) 3L else i % 4)
      .toDF("bucket")
    val shifted = DataQuality.driftPsiOf(refB, curB).collect()
    assert(shifted.map(_.getAs[Long]("contrib_micro")).sum > 0L)
    assert(shifted.forall(_.getAs[Long]("contrib_micro") >= 0L))
    assert(shifted.map(_.getAs[Long]("n_ref")).sum == 300L)
    assert(shifted.map(_.getAs[Long]("n_cur")).sum == 300L)
    // k-anonymity sanity on the real corpus: quarter generalization can
    // only raise (or keep) the k level and shrink the exposed rows
    val ka = DataQuality.kAnonymity(spark, sf).collect()
      .map(r => r.getAs[String]("level") ->
        (r.getAs[Long]("k_anonymity"), r.getAs[Long]("rows_at_risk"))).toMap
    assert(ka("quarter")._1 >= ka("month")._1)
    assert(ka("quarter")._2 <= ka("month")._2)
  }
}
