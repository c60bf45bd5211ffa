package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Index-side takedown: the tombstone-vs-compact gate on planted list
  * geometry (both polarities), the cross-family revocation-list
  * contract, and the audit invariants on real testdata. */
class IvfTakedownSpec extends SparkSpec {
  import spark.implicits._

  test("revocation list matches the document-side takedown's") {
    assert(Similarity.TakedownMod == graft.pipeline.Takedown.RevokeMod)
    assert(Similarity.TakedownRem == graft.pipeline.Takedown.RevokeRem)
  }

  private def vec(seed: Int): Array[Float] =
    Array(1.0f + seed % 3, 0.5f + seed % 5, 0.25f * (1 + seed % 2), 1.0f)

  test("mostly-revoked list compacts: rows reclaimed, no tombstones") {
    // ids = 0 (the % 97 == 0 seed) + eight revoked (id % 131 == 5)
    val ids = Seq(0L, 5L, 136L, 267L, 398L, 529L, 660L, 791L, 922L)
    val v = ids.zipWithIndex.map { case (id, i) => (id, vec(i)) }
      .toDF("vec_id", "embedding")
    val r = Similarity.ivfTakedownAuditOf(v).collect()(0)
    assert(r.getAs[Long]("n_total") == 9)
    assert(r.getAs[Long]("n_revoked") == 8)
    assert(r.getAs[Long]("n_lists") == 1)
    assert(r.getAs[Long]("n_lists_hit") == 1)
    assert(r.getAs[Long]("n_lists_compact") == 1) // 8 * 8 >= 9
    assert(r.getAs[Long]("n_lists_tombstone") == 0)
    assert(r.getAs[Long]("n_tombstones_kept") == 0)
    assert(r.getAs[Long]("n_reclaimed") == 8)
    assert(r.getAs[Long]("max_live_list") == 1)
  }

  test("barely-touched list keeps tombstones instead of rewriting") {
    // ids 0..16: only id 5 is revoked -> 1 * 8 < 17
    val v = (0L to 16L).zipWithIndex
      .map { case (id, i) => (id, vec(i)) }.toDF("vec_id", "embedding")
    val r = Similarity.ivfTakedownAuditOf(v).collect()(0)
    assert(r.getAs[Long]("n_total") == 17)
    assert(r.getAs[Long]("n_revoked") == 1)
    assert(r.getAs[Long]("n_lists_compact") == 0)
    assert(r.getAs[Long]("n_lists_tombstone") == 1)
    assert(r.getAs[Long]("n_tombstones_kept") == 1)
    assert(r.getAs[Long]("n_reclaimed") == 0)
    assert(r.getAs[Long]("max_live_list") == 16)
  }

  test("audit invariants on real testdata") {
    val r = Similarity.ivfTakedownAudit(spark, sf).collect()(0)
    val hit = r.getAs[Long]("n_lists_hit")
    assert(hit == r.getAs[Long]("n_lists_compact") +
      r.getAs[Long]("n_lists_tombstone"))
    assert(r.getAs[Long]("n_revoked") ==
      r.getAs[Long]("n_tombstones_kept") + r.getAs[Long]("n_reclaimed"))
    assert(hit <= r.getAs[Long]("n_lists"))
    // the revocation list is a ~1/131 sliver of the corpus
    val frac = r.getAs[Long]("n_revoked").toDouble / r.getAs[Long]("n_total")
    assert(frac > 0 && frac < 0.03, s"revoked fraction $frac")
    assert(r.getAs[Long]("max_live_list") <= r.getAs[Long]("n_total"))
  }
}
