package graft.ml

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Entity-resolution matcher: linkage quality floors on the synthetic
  * noise model, and the block-size cap that keeps the quadratic candidate
  * stage away from degenerate blocking keys. */
class EntityResolutionSpec extends SparkSpec {

  test("linkage quality: precision and recall floors at smoke scale") {
    val q = EntityResolution.matchQuality(spark, sf).collect().head
    val precision = q.getAs[Long]("precision_milli")
    val recall = q.getAs[Long]("recall_milli")
    // measured: threshold 700 separates true pairs (floor 700) from
    // false-pair p99 (666); best-match keeps both metrics above 90%
    assert(precision >= 900, s"precision $precision")
    assert(recall >= 900, s"recall $recall")
    assert(q.getAs[Long]("n_matches") > 0)
  }

  test("entity clusters equal a union-find replay of the match pairs") {
    val pairs = EntityResolution.matches(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id") * 10, r.getAs[Long]("b_id") * 10 + 1))
    // driver-side union-find ground truth with min-label roots
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb)
        parent(math.max(ra, rb)) = lo }
    }
    val want = parent.keys.map(n => n -> find(n)).toMap
    val sizes = want.values.groupBy(identity).map { case (e, g) => e -> g.size }

    val got = EntityResolution.entityClusters(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val node = r.getAs[Long]("record_id") * 10 +
        (if (r.getAs[String]("side") == "a") 0 else 1)
      assert(r.getAs[Long]("entity_id") == want(node),
        s"node $node entity mismatch")
      assert(r.getAs[Long]("entity_size") == sizes(want(node)).toLong)
    }
    // chaining actually happens: at least one entity spans > 2 records
    assert(got.map(_.getAs[Long]("entity_size")).max > 2L)
    spark.catalog.clearCache()
  }

  test("matches are at most one per left record, above threshold") {
    val m = EntityResolution.matches(spark, sf)
    val perLeft = m.groupBy("a_id").count().agg(max("count")).collect().head.getLong(0)
    assert(perLeft == 1L)
    assert(m.agg(min("jm")).collect().head.getLong(0) >=
      EntityResolution.MatchThreshold)
  }

  test("sorted_overlap kernel agrees with array_intersect on edge cases") {
    import spark.implicits._
    val cases = Seq(
      (Array(1, 3, 5), Array(2, 3, 5, 9)),  // partial overlap
      (Array.empty[Int], Array(1, 2)),      // empty side
      (Array(4, 7), Array(4, 7)),           // identical
      (Array(1, 2), Array(3, 4)),           // disjoint
      (Array(-5, 0, 2), Array(-5, 2, 8)))   // negatives
    val df = cases.toDF("a", "b")
    val got = df.select(
      graft.functions.ArrayOps.sorted_overlap(col("a"), col("b")).as("ov"),
      size(org.apache.spark.sql.functions.array_intersect(
        col("a"), col("b"))).as("want"))
      .collect()
    got.foreach(r => assert(r.getAs[Int]("ov") == r.getAs[Int]("want")))
  }

  test("block cap excludes oversized blocks from the quadratic join") {
    import spark.implicits._
    // one hot block ("aaaaaaaa", 5 rows) and one cold block (2 rows)
    val a = Seq(
      (1L, "aaaaaaaaaaaa"), (2L, "aaaaaaaaaaab"), (3L, "aaaaaaaaaaac"),
      (4L, "aaaaaaaaaaad"), (5L, "aaaaaaaaaaae"),
      (10L, "bbbbbbbbbbba"), (11L, "bbbbbbbbbbbc"))
      .toDF("a_id", "a_name")
    val b = a.select(col("a_id").as("b_id"),
      upper(col("a_name")).as("b_name_raw"))
    val capped = EntityResolution.scoredPairsOf(a, b, cap = 4)
    // the 5-row "aaaaaaaa" block is over cap -> no pairs from it at all;
    // the 2-row block contributes its full 2x2
    val got = capped.select("a_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L), s"got $got")
    assert(capped.count() == 4)
  }

  test("block cap bounds BOTH sides: a B-side-only hot block is excluded") {
    import spark.implicits._
    // block "cccccccc": ONE A row but 5 B rows — per-block candidate
    // volume is |A|x|B|, so a one-sided (A-only) cap would admit this
    // block and melt a reducer on a degenerate B-side key
    val a = Seq((1L, "cccccccccccc"), (10L, "ddddddddddda"), (11L, "dddddddddddb"))
      .toDF("a_id", "a_name")
    val b = Seq(
      (21L, "CCCCCCCCCCCA"), (22L, "CCCCCCCCCCCB"), (23L, "CCCCCCCCCCCC"),
      (24L, "CCCCCCCCCCCD"), (25L, "CCCCCCCCCCCE"),
      (30L, "DDDDDDDDDDDA"), (31L, "DDDDDDDDDDDB"))
      .toDF("b_id", "b_name_raw")
    val capped = EntityResolution.scoredPairsOf(a, b, cap = 4)
    val blocksSeen = capped.select("a_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // only the d-block survives (1 or 2 rows per side); the c-block's
    // B side exceeds the cap and contributes nothing
    assert(blocksSeen == Set(10L, 11L), s"got $blocksSeen")
    assert(capped.count() == 4)
  }

  test("blocking stats: top volumes descending, admitted flag matches the cap") {
    val rows = EntityResolution.blockingStats(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val vols = rows.map(_.getAs[Long]("volume"))
    assert(vols.zip(vols.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("volume") ==
        r.getAs[Long]("na") * r.getAs[Long]("nb"))
      assert(r.getAs[Boolean]("admitted") ==
        (r.getAs[Long]("na") <= 1000 && r.getAs[Long]("nb") <= 1000))
    }
  }

  test("threshold sweep: counts shrink as the gate rises; the 700 point " +
    "reproduces er_match_quality") {
    val sweep = EntityResolution.thresholdSweep(spark, sf)
      .collect().map(r => r.getAs[Int]("threshold") -> r).toMap
    assert(sweep.keySet == Set(500, 600, 700, 800, 900))
    val byThr = Seq(500, 600, 700, 800, 900).map(sweep)
    val nm = byThr.map(_.getAs[Long]("n_matches"))
    val nc = byThr.map(_.getAs[Long]("n_correct"))
    assert(nm.zip(nm.tail).forall { case (a, b) => a >= b })
    assert(nc.zip(nc.tail).forall { case (a, b) => a >= b })
    val q = EntityResolution.matchQuality(spark, sf).collect().head
    assert(sweep(700).getAs[Long]("n_matches") == q.getAs[Long]("n_matches"))
    assert(sweep(700).getAs[Long]("n_correct") == q.getAs[Long]("n_correct"))
    assert(sweep(700).getAs[Long]("recall_milli") == q.getAs[Long]("recall_milli"))
  }

  test("golden records: one per A entity; unmatched singletons pass " +
    "through; phone survivorship always has provenance") {
    import org.apache.spark.sql.functions.col
    val g = EntityResolution.goldenRecords(spark, sf)
    val rows = g.collect()
    assert(rows.length ==
      EntityResolution.sourceA(spark, sf).count().toInt)
    assert(rows.map(_.getAs[Long]("entity_id")).distinct.length == rows.length)
    val matched = rows.count(_.getAs[Boolean]("matched"))
    assert(matched > 0 && matched < rows.length)
    rows.foreach { r =>
      val phone = Option(r.getAs[String]("phone"))
      val src = r.getAs[String]("phone_src")
      assert(phone.isDefined == (src != "none"),
        s"provenance/value mismatch: $src vs $phone")
      if (!r.getAs[Boolean]("matched")) {
        // singleton: freshness is A's own stamp, phone can only be A's
        val id = r.getAs[Long]("entity_id")
        assert(r.getAs[Long]("last_updated") == (id * 48271L) % 100000L % 997L)
        assert(src == "A" || src == "none")
      }
    }
  }
}
