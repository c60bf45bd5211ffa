package graft.ml

import graft.SparkSpec

/** Incremental IVF maintenance (ivfAppendAuditOf): the quantizer is
  * trained on the base split only (frozen across appends), and the two
  * staleness gates fire exactly when they should. Planted geometry:
  * base = five unit directions whose ids hit the seed stride (0, 97,
  * 194, 291, 485 — all % 10 < 8, so they are base), deltas on
  * ids ≡ 8, 9 (mod 10). */
class IvfAppendSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64
  private def unit(dim: Int, id: Long): (Long, Array[Float]) = {
    val a = Array.fill(dims)(0.0f); a(dim) = 3.0f; (id, a)
  }
  private def diag(id: Long): (Long, Array[Float]) =
    (id, Array.fill(dims)(1.0f))

  // base: exactly the five seeds, one per direction (ids 0/97/194/291/
  // 485 are % 97 == 0 candidates under the min-97 stride; only they
  // seed centroids)
  private val base = Seq(
    unit(0, 0L), unit(1, 97L), unit(2, 194L), unit(3, 291L), unit(4, 485L))

  private def audit(delta: Seq[(Long, Array[Float])]) =
    Similarity.ivfAppendAuditOf((base ++ delta).toDF("vec_id", "embedding"))
      .head()

  test("no drift: balanced in-distribution append leaves both gates cold") {
    // five deltas per direction, ids 8,18,...,98... chosen ≡ 8,9 (mod 10)
    val delta = (0 until 25).map { i =>
      val id = 8L + 10L * i + (if (i % 2 == 0) 0L else 1L)
      unit(i % 5, id)
    }
    val r = audit(delta)
    assert(r.getAs[Long]("n_base") == 5L)
    assert(r.getAs[Long]("n_delta") == 25L)
    assert(r.getAs[Long]("n_lists") == 5L)
    assert(r.getAs[Long]("max_list_after") == 6L)
    assert(r.getAs[Long]("retrain_balance") == 0L, s"balance cold: $r")
    assert(r.getAs[Long]("retrain_quality") == 0L, s"quality cold: $r")
    // perfect fit on both sides: mean best dot = 10000^2
    assert(r.getAs[Long]("mean_cdot_base") == 100000000L)
    assert(r.getAs[Long]("mean_cdot_delta") == 100000000L)
  }

  test("hot-list drift: appends concentrating on one list trip the " +
      "balance gate; fit stays perfect so quality stays cold") {
    val delta = (0 until 30).map(i => unit(0, 8L + 10L * i)) // all -> list 0
    val r = audit(delta)
    assert(r.getAs[Long]("n_lists") == 5L, "frozen quantizer: count from base only")
    assert(r.getAs[Long]("max_list_after") == 31L)
    // 31 * 5 = 155 > 4 * 35 = 140
    assert(r.getAs[Long]("retrain_balance") == 1L, s"balance hot: $r")
    assert(r.getAs[Long]("retrain_quality") == 0L, s"quality cold: $r")
  }

  test("distribution shift: deltas far from every centroid trip the " +
      "quality gate") {
    val delta = (0 until 20).map(i => diag(8L + 10L * i))
    val r = audit(delta)
    assert(r.getAs[Long]("n_lists") == 5L)
    // diag·e_i = 1250 * 10000 per centroid — an 8x fit drop
    assert(r.getAs[Long]("mean_cdot_delta") < r.getAs[Long]("mean_cdot_base") / 2)
    assert(r.getAs[Long]("retrain_quality") == 1L, s"quality hot: $r")
  }

  test("frozen quantizer: centroid count is identical across delta " +
      "contents (the append never retrains)") {
    val a = audit((0 until 5).map(i => unit(i, 8L + 10L * i)))
    val b = audit((0 until 5).map(i => diag(9L + 10L * i)))
    assert(a.getAs[Long]("n_lists") == b.getAs[Long]("n_lists"))
    assert(a.getAs[Long]("max_list_base") == b.getAs[Long]("max_list_base"))
  }

  // ---- split maintenance (ivfSplitMaintenanceOf / ivfSplitListsOf) ----

  private def maintain(delta: Seq[(Long, Array[Float])]) =
    Similarity.ivfSplitMaintenanceOf(
      base.toDF("vec_id", "embedding"),
      delta.toDF("vec_id", "embedding")).head()

  test("split maintenance: a hot-drift list splits into rank-contiguous " +
      "chunks and the 4x alarm clears") {
    // 30 appends onto list 0: m = 31, N = 35, L = 5 -> trigger
    // 155 > 70, s = ceil(155/70) = 3, chunks 11/10/10
    val delta = (0 until 30).map(i => unit(0, 1000L + i))
    val r = maintain(delta)
    assert(r.getAs[Long]("n_overflow") == 1L, s"one hot list: $r")
    assert(r.getAs[Long]("n_lists_after") == 7L, s"5 + (3-1): $r")
    assert(r.getAs[Long]("max_list_before") == 31L)
    assert(r.getAs[Long]("max_list_after") == 11L, s"ceil(31/3): $r")
    assert(r.getAs[Long]("alarm_before") == 1L, s"31*5 > 4*35: $r")
    assert(r.getAs[Long]("alarm_after") == 0L, s"11*7 <= 4*35: $r")
  }

  test("split maintenance: a balanced corpus is a no-op (no overflow, " +
      "every member stays in chunk 0)") {
    val delta = (0 until 25).map(i => unit(i % 5, 1000L + i))
    val r = maintain(delta)
    assert(r.getAs[Long]("n_overflow") == 0L)
    assert(r.getAs[Long]("n_lists_after") == r.getAs[Long]("n_lists"))
    assert(r.getAs[Long]("max_list_after") == r.getAs[Long]("max_list_before"))
    assert(r.getAs[Long]("alarm_after") == 0L)
    val lists = Similarity.ivfSplitListsOf(
      base.toDF("vec_id", "embedding"), delta.toDF("vec_id", "embedding"))
      .collect()
    assert(lists.length == 30)
    assert(lists.forall(_.getAs[Long]("chunk") == 0L), "no-op keeps chunk 0")
  }

  test("split maintenance: only the overflowing list gains chunks; its " +
      "chunk sizes are contiguous 0..s-1 and differ by at most one") {
    val delta = (0 until 30).map(i => unit(0, 1000L + i))
    val lists = Similarity.ivfSplitListsOf(
      base.toDF("vec_id", "embedding"), delta.toDF("vec_id", "embedding"))
      .collect()
    val byList = lists.groupBy(_.getAs[Long]("centroid_id"))
    // frozen quantizer: every post-maintenance list id is a base seed
    assert(byList.keySet.subsetOf(Set(0L, 97L, 194L, 291L, 485L)))
    val hot = byList(0L).map(_.getAs[Long]("chunk"))
    val cold = (byList - 0L).values.flatten.map(_.getAs[Long]("chunk"))
    assert(cold.forall(_ == 0L), "untouched lists stay whole")
    val sizes = hot.groupBy(identity).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L), s"chunks 0..s-1: $sizes")
    assert(sizes.values.max - sizes.values.min <= 1,
      s"rank-contiguous chunking is balanced: $sizes")
  }

  test("split maintenance guarantee: alarm_after is 0 at every drift " +
      "mass while fair share stays >= 1.5") {
    for (n <- Seq(10, 30, 60, 120)) {
      val r = maintain((0 until n).map(i => unit(0, 1000L + i)))
      val total = r.getAs[Long]("n_total")
      val listsAfter = r.getAs[Long]("n_lists_after")
      assert(total * 2 >= 3 * r.getAs[Long]("n_lists"),
        s"precondition fair share >= 1.5 at n=$n")
      assert(r.getAs[Long]("alarm_after") == 0L,
        s"alarm must clear at n=$n: $r")
      assert(r.getAs[Long]("max_list_after") * listsAfter <= 4 * total,
        s"bound holds numerically at n=$n: $r")
    }
  }
}
