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
}
