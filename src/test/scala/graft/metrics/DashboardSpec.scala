package graft.metrics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proves the scale-safe quantized decile plan ([[Dashboard.qualityDeciles]],
  * the registered o8 query) agrees with the exact global-sort yardstick
  * ([[Dashboard.qualityDecilesExactOf]], ntile(10) with a doc_id tie-break):
  * identical away from grid-tie edges, within one decile at them. This is the
  * safety argument for shipping the windowless plan — the same exact/approx
  * pairing as dedup_embedding_pairs vs its LSH twin. */
class DashboardSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: steps only count when reached strictly after the previous " +
      "step; out-of-order completions don't") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // A completes every step in order; B viewed BEFORE signing up (the
    // later click/purchase must not count without a qualifying view);
    // C stops after viewing
    val events = Seq(
      (1L, "signup", "2024-01-01 10:00:00"), (1L, "view", "2024-01-01 10:01:00"),
      (1L, "click", "2024-01-01 10:02:00"), (1L, "purchase", "2024-01-01 10:03:00"),
      (2L, "view", "2024-01-01 09:00:00"), (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 11:00:00"), (2L, "purchase", "2024-01-01 12:00:00"),
      (3L, "signup", "2024-01-01 08:00:00"), (3L, "view", "2024-01-01 09:30:00"))
      .map { case (u, e, ts) => (u, e, t(ts)) }
      .toDF("user_id", "event_type", "ts")
    val got = Dashboard.funnelConversionOf(events).collect()
      .map(r => r.getAs[Int]("step") ->
        ((r.getAs[String]("event_type"), r.getAs[Long]("n_users"),
          r.getAs[Long]("conv_milli")))).toMap
    assert(got(1) == (("signup", 3L, 1000L)))
    assert(got(2) == (("view", 2L, 666L)), s"B's pre-signup view must not count: $got")
    assert(got(3) == (("click", 1L, 500L)))
    assert(got(4) == (("purchase", 1L, 1000L)))
  }

  test("retention cohorts: offsets anchor at each user's first week") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // 2024-01-01 is a Monday. u1 cohort W0, active W0+W2; u2 cohort W0
    // only; u3 cohort W1, active W1+W2
    val events = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-16 10:00:00"),
      (2L, "2024-01-03 10:00:00"),
      (3L, "2024-01-09 10:00:00"), (3L, "2024-01-17 10:00:00"))
      .map { case (u, ts) => (u, t(ts)) }
      .toDF("user_id", "ts")
    val got = Dashboard.retentionCohortsOf(events).collect()
      .map(r => (r.getAs[String]("cohort_week"),
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_users"))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)), got.toString)
  }

  test("histogram sketch quantiles land within one bin of the exact answer") {
    val exact = Dashboard.valuePercentiles(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val sketch = Dashboard.histQuantiles(spark, sf).collect()
    assert(sketch.map(_.getAs[String]("event_type")).toSet == exact.keySet)
    sketch.foreach { s =>
      val e = exact(s.getAs[String]("event_type"))
      assert(s.getAs[Long]("n") == e.getAs[Long]("n"))
      // bounded state: bins ≤ value range / width
      assert(s.getAs[Long]("n_bins") <= 49500 / Dashboard.HistBinCents + 1)
      // p50 estimate is the true median's bin lower edge: within one
      // bin width below the exact interpolated median
      val p50 = s.getAs[Long]("p50_est").toDouble
      val exact50 = e.getAs[Double]("p50")
      assert(p50 <= exact50 && exact50 - p50 <= Dashboard.HistBinCents,
        s"p50_est $p50 vs exact $exact50")
    }
  }

  test("Count-Min estimates never undercount and the grid stays bounded") {
    val exact = graft.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    val est = Dashboard.cmsUserCounts(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("est_events")).toMap
    // one estimate per observed user, each >= the true count (the CMS
    // one-sided error guarantee — min over depths of colliding sums)
    assert(est.keySet == exact.keySet)
    est.foreach { case (u, e) =>
      assert(e >= exact(u), s"user $u est $e < exact ${exact(u)}")
    }
    // the expected overestimate is N/width per depth; min-over-3-depths
    // lands well under one grid row's average load in aggregate
    val n = exact.values.sum.toDouble
    val meanOver = est.map { case (u, e) => (e - exact(u)).toDouble }.sum / est.size
    assert(meanOver <= n / Dashboard.CmsWidth,
      s"mean overestimate $meanOver vs N/width ${n / Dashboard.CmsWidth}")
  }

  test("MAD outliers agree with a local median/MAD recomputation") {
    val got = Dashboard.madOutliers(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val cents = graft.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def med2(xs: Seq[Long]): Long = { // 2x the interpolated median
      val n = xs.length
      if (n % 2 == 1) 2 * xs(n / 2) else xs(n / 2 - 1) + xs(n / 2)
    }
    assert(got.keySet == cents.keySet)
    cents.foreach { case (t, xs) =>
      val r = got(t)
      val m2 = med2(xs)
      assert(r.getAs[Long]("n") == xs.length)
      assert(r.getAs[Long]("med_half_cents") == m2)
      val dev2 = xs.map(x => math.abs(2 * x - m2)).sorted
      val mad4 = med2(dev2)
      assert(r.getAs[Long]("mad_quarter_cents") == mad4)
      val expected = dev2.count(d => d * 10000 > mad4 * 22239).toLong
      assert(r.getAs[Long]("n_outliers") == expected)
      assert(expected < xs.length / 2, "a robust rule flags a minority")
    }
  }

  test("quantized deciles match ntile(10) away from edges, within 1 at them") {
    val stats = graft.ml.TextOps.textStats(spark, sf)
    val quant = Dashboard.qualityDeciles(spark, sf)
      .select(col("doc_id"), col("decile").as("d_quant"))
    val exact = Dashboard.qualityDecilesExactOf(stats)
      .select(col("doc_id"), col("decile").as("d_exact"))

    // the nine interpolated decile edges on the qbin grid, same aggregate
    // the registered plan broadcasts
    val edges: Seq[Double] = stats
      .select(floor(col("quality_score") * 10000).cast("long").as("qbin"))
      .agg(percentile(col("qbin"), array((1 to 9).map(k => lit(k / 10.0)): _*)))
      .as[Seq[Double]].head()

    val joined = quant.join(exact, "doc_id")
      .join(stats.select(col("doc_id"),
        floor(col("quality_score") * 10000).cast("long").as("qbin")), "doc_id")
      .select($"doc_id", $"d_quant", $"d_exact", $"qbin")
      .as[(Long, Int, Int, Long)].collect()

    assert(joined.length == 500) // inner joins lost nothing: same doc set

    // a row is at a grid-tie edge iff its grid cell abuts an interpolated
    // edge — the only place threshold-binning and equal-count ntile can
    // legitimately disagree (ties at the cut get binned together vs split)
    def atEdge(qbin: Long): Boolean = edges.exists(e => math.abs(qbin - e) <= 1.0)

    val offInterior = joined.filter { case (_, dq, dx, qb) => !atEdge(qb) && dq != dx }
    assert(offInterior.isEmpty,
      s"interior rows must bin identically, got ${offInterior.take(5).toSeq}")

    val offEdge = joined.filter { case (_, dq, dx, _) => math.abs(dq - dx) > 1 }
    assert(offEdge.isEmpty,
      s"edge rows may differ by at most one decile, got ${offEdge.take(5).toSeq}")

    // and the approximation is not vacuous: edge-adjacent rows exist in the
    // corpus, so the interior-exactness assertion above has real teeth
    assert(joined.exists { case (_, _, _, qb) => atEdge(qb) })
  }

  test("stratified sample: exactly n per language, invariant to physical partitioning") {
    val n = 40
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("lang"), r.getAs[Int]("sample_rank"), r.getAs[Long]("doc_id"))
    val out = Dashboard.stratifiedSample(spark, sf, n).collect().map(key).toSet
    // every language in the test corpus has > n docs -> exactly n each
    val perLang = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perLang.values.forall(_ == n), s"per-lang counts $perLang")
    // ranks are total: 1..n per language
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).toSeq.sorted == (1 to n), s"ranks not total for $lang")
    }

    // the two-phase result must not depend on how the input happens to be
    // split: recompute over aggressively repartitioned inputs and compare
    // against the single-window definitional form
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        graft.expr.Exprs.serialOf(col("doc_id")).as("hkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("hkey"), col("doc_id"))
    val definitional = docs
      .withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= n)
      .collect().map(key).toSet
    assert(out == definitional, "two-phase result differs from the definition")
    for (parts <- Seq(1, 7, 64)) {
      val reparted = graft.Tables.documents(spark, sf).repartition(parts)
      val viaParts = Dashboard.stratifiedSample(spark, sf, n) // plan-identical
      // rebuild the operator over the repartitioned frame by inlining its
      // two phases (the registered form reads straight from parquet)
      val pre = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), spark_partition_id())
        .orderBy(col("hkey"), col("doc_id"))
      val cand = reparted
        .select(col("doc_id"), col("lang"),
          graft.expr.Exprs.serialOf(col("doc_id")).as("hkey"))
        .withColumn("prerank", row_number().over(pre))
        .filter(col("prerank") <= n).drop("prerank")
      val twoPhase = cand
        .withColumn("sample_rank", row_number().over(w).cast("int"))
        .filter(col("sample_rank") <= n)
        .select("lang", "sample_rank", "doc_id", "hkey")
        .collect().map(key).toSet
      assert(twoPhase == definitional, s"result changed at $parts partitions")
      assert(viaParts.collect().map(key).toSet == definitional)
    }
  }

  test("Pareto frontier equals the definitional all-pairs skyline") {
    val pts = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val a = pts.select(col("p_partkey").as("k"),
      col("p_retailprice").as("pr"), col("p_size").as("sz"))
    val b = pts.select(col("p_retailprice").as("bpr"), col("p_size").as("bsz"))
    // definitional: keep rows with no dominator (test-only pair join)
    val dominated = a.join(b,
        col("bpr") <= col("pr") && col("bsz") >= col("sz") &&
          (col("bpr") < col("pr") || col("bsz") > col("sz")), "left_semi")
      .select(col("k"))
    val expected = a.join(dominated, Seq("k"), "left_anti")
      .collect().map(_.getAs[Long]("k")).toSet
    val got = Dashboard.paretoParts(spark, sf)
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("shipping priority: 10 rows, descending revenue, all pre-cutoff orders") {
    val rows = Dashboard.shippingPriority(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (x, y) => x >= y })
    val cutoff = java.time.LocalDateTime.parse("1995-03-15T00:00:00")
    assert(rows.forall(
      _.getAs[java.time.LocalDateTime]("o_orderdate").isBefore(cutoff)))
  }

  test("percent_rank/cume_dist: proper distributions within each tenant") {
    val rows = Dashboard.tenantValueDistribution(spark, sf).collect()
    val byTenant = rows.groupBy(_.getAs[Long]("tenant_id"))
    assert(byTenant.size > 1)
    byTenant.values.foreach { rs =>
      val pr = rs.map(_.getAs[Double]("pct_rank"))
      val cd = rs.map(_.getAs[Double]("cume"))
      assert(pr.min == 0.0 && pr.max <= 1.0)
      assert(cd.min > 0.0 && cd.max == 1.0)
      // cume_dist dominates percent_rank pointwise (ties count for cume)
      assert(rs.forall(r =>
        r.getAs[Double]("cume") >= r.getAs[Double]("pct_rank")))
    }
  }

  test("weighted sample: copies always sum to N, heavy docs drawn " +
    "proportionally") {
    import spark.implicits._
    // one doc carries half the total mass -> ~N/2 copies; light docs
    // at most one each
    val docs = ((1L to 99L).map(i => (i, 10L)) :+ (500L, 990L)).toDF("doc_id", "w")
    val rows = Dashboard.weightedSampleOf(docs, n = 100L).collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum == 100L)
    val heavy = rows.find(_.getAs[Long]("doc_id") == 500L).get
    assert(math.abs(heavy.getAs[Long]("n_copies") - 50L) <= 1L,
      s"heavy doc drew ${heavy.getAs[Long]("n_copies")} copies")
    assert(rows.filter(_.getAs[Long]("doc_id") != 500L)
      .forall(_.getAs[Long]("n_copies") == 1L))
    // the registered corpus form also conserves N exactly
    val corpus = Dashboard.weightedSample(spark, sf).collect()
    assert(corpus.map(_.getAs[Long]("n_copies")).sum ==
      Dashboard.WeightedSampleN)
  }

  test("weighted sample degenerate corpora: single doc takes all copies; " +
    "uniform weights draw at most one each") {
    import spark.implicits._
    val one = Dashboard.weightedSampleOf(
      Seq((42L, 700L)).toDF("doc_id", "w"), n = 100L).collect()
    assert(one.length == 1 && one.head.getAs[Long]("n_copies") == 100L)
    val uniform = Dashboard.weightedSampleOf(
      (1L to 500L).map((_, 1L)).toDF("doc_id", "w"), n = 100L).collect()
    assert(uniform.map(_.getAs[Long]("n_copies")).sum == 100L)
    assert(uniform.forall(_.getAs[Long]("n_copies") == 1L))
  }

  test("weighted sample: zero-weight rows are never drawn (even at the " +
    "head of the hash order) and total < n clamps to the available mass") {
    import spark.implicits._
    val ids = 1L to 40L
    // the doc FIRST in hash order gets w=0 — the exact row whose
    // cum_hi-1 = -1 used to fork Spark's truncating div from DuckDB's
    // flooring // (ADVICE r9); a few more zeros land mid-line
    val headId = ids.minBy(id => ((id * 48271L) % 100000L, id))
    val docs = ids.map(id =>
      (id, if (id == headId || id % 7 == 0) 0L else 2L))
    val total = docs.map(_._2).sum
    assert(total < 100L) // exercises the clamp boundary
    val rows = Dashboard.weightedSampleOf(docs.toDF("doc_id", "w"), n = 100L)
      .collect()
    val wOf = docs.toMap
    assert(rows.forall(r => wOf(r.getAs[Long]("doc_id")) > 0L),
      "zero-weight doc drawn")
    assert(rows.forall(_.getAs[Long]("n_copies") >= 1L))
    assert(rows.map(_.getAs[Long]("n_copies")).sum == total,
      "under-mass draw must conserve least(n, total) = total")
    // with mass >= n the same corpus still fills exactly n
    val full = Dashboard.weightedSampleOf(
      docs.map { case (id, w) => (id, w * 10L) }.toDF("doc_id", "w"),
      n = 100L).collect()
    assert(full.map(_.getAs[Long]("n_copies")).sum == 100L)
  }

  test("weighted sample matches the naive line-walk on random weights") {
    import spark.implicits._
    val rnd = new scala.util.Random(7331)
    val docs = (1L to 300L).map(i => (i, 1L + rnd.nextInt(50).toLong))
    val n = 37L
    val got = Dashboard.weightedSampleOf(docs.toDF("doc_id", "w"), n = n)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    // naive: walk the hash-ordered line, count grid points per interval
    val ordered = docs.sortBy { case (id, _) => ((id * 48271L) % 100000L, id) }
    val total = docs.map(_._2).sum
    var cum = 0L
    val expected = ordered.flatMap { case (id, w) =>
      val lo = cum; cum += w
      val pts = (0L until n).count(k => {
        // the selection formula's grid convention: point k sits at
        // ceil(k*total/n) — the first weight unit whose prefix crosses
        // the k/n fraction
        val p = (k * total + n - 1) / n; p >= lo && p < cum
      }).toLong
      if (pts >= 1) Some(id -> pts) else None
    }.toMap
    assert(expected.values.sum == n)
    assert(got == expected)
  }

  test("epoch order: two-phase numbering equals the naive global sort " +
    "on adversarial id sets") {
    import spark.implicits._
    // ids crafted to stress bucket boundaries: dense runs, huge gaps,
    // and collisions of h on the width-3126 bucket edges
    val ids = ((0L until 200L) ++ (100000L until 100050L) ++
      Seq(3125L, 3126L, 6250L, 6251L, 999999999L)).distinct
    val docs = ids.map(Tuple1(_)).toDF("doc_id")
    val got = Dashboard.epochOrderOf(docs, epochs = 3, buckets = 8)
      .collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("position")).toMap
    (0 until 3).foreach { e =>
      val expected = ids
        .sortBy(id => ((id * 48271L + e * 9973L) % 100000L, id))
        .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      ids.foreach(id => assert(got((e, id)) == expected(id),
        s"epoch $e doc $id: ${got((e, id))} vs ${expected(id)}"))
    }
  }

  test("epoch order: dense positions per epoch, epochs shuffle differently") {
    val rows = Dashboard.epochOrder(spark, sf).collect()
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == Set(0, 1))
    val n = graft.Tables.documents(spark, sf).count()
    byEpoch.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("position")).sorted.toSeq == (1L to n))
    }
    // the two epochs genuinely reorder (hash differs by the epoch term)
    def orderOf(e: Int) = byEpoch(e).sortBy(_.getAs[Long]("position"))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(orderOf(0) != orderOf(1))
  }

  test("KMV overlap estimates track the exact pairwise intersections") {
    val ev = graft.Tables.events(spark, sf)
    val exact = ev.select(col("event_type").as("ta"), col("user_id"))
      .distinct()
      .join(ev.select(col("event_type").as("tb"), col("user_id")).distinct(),
        "user_id")
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n_exact"))
    val got = Dashboard.kmvUserOverlap(spark, sf)
    val joined = got.join(exact, Seq("ta", "tb"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val est = r.getAs[Long]("est_overlap")
      val ex = Option(r.getAs[Any]("n_exact")).fold(0L)(_.asInstanceOf[Long])
      // k=64 sketches: generous multiplicative band plus small-count slack
      assert(est <= 2 * ex + 20 && ex <= 2 * est + 20,
        s"(${r.getAs[String]("ta")}, ${r.getAs[String]("tb")}): est=$est exact=$ex")
    }
  }

  test("purged split: 7-day embargo strictly separates train from test") {
    val ev = graft.Tables.events(spark, sf).select("event_id", "ts")
    val labeled = Dashboard.purgedTimeSplit(spark, sf).join(ev, "event_id")
    val bounds = labeled.groupBy("split")
      .agg(max(col("ts")).as("hi"), min(col("ts")).as("lo"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("split") -> r).toMap
    assert(bounds.keySet == Set("train", "test"))
    val trainHi = bounds("train").getAs[java.time.LocalDateTime]("hi")
    val testLo = bounds("test").getAs[java.time.LocalDateTime]("lo")
    assert(java.time.Duration.between(trainHi, testLo).toDays >= 7)
    // the embargo really removed rows: labeled < all events
    assert(labeled.count() < ev.count())
  }
}
