package graft.ml

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests for the newest pair-mining arms: the distributed
  * containment join and the perceptual-hash blocker each agree with a
  * naive single-machine reference on randomized corpora (fixed
  * ScalaCheck seeds — no scalatest-plus bridge in the offline cache). */
class PairMiningPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4177L + i)))

  test("containment pairs match the naive shingle-set reference") {
    // small token alphabet + short docs force real shingle overlap;
    // a few docs are literal prefix quotes of others
    val docGen: Gen[Seq[String]] = for {
      len <- Gen.choose(3, 18)
      toks <- Gen.listOfN(len, Gen.choose(0, 11).map(i => s"t$i"))
    } yield toks
    val base = samples(docGen, 40)
    val quoted = base.take(6).map(_.take(6)) // prefix quotes
    val corpus = (base ++ quoted).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
    val got = Dedup.containmentPairsOf(corpus.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("cont_a_in_b_milli"), r.getAs[Long]("cont_b_in_a_milli")))
      .toSet
    // reference: distinct word-trigram shingle STRINGS per doc (the df
    // cap of 1000 never triggers at this corpus size)
    val sets = corpus.map { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      id -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val expected = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      sa = sets(a); sb = sets(b) if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size.toLong if inter > 0
      ca = inter * 1000 / sa.size; cb = inter * 1000 / sb.size
      if ca >= 900 || cb >= 900
    } yield (a, b, ca, cb)).toSet
    assert(expected.nonEmpty, "generator should plant containment pairs")
    assert(got == expected)
    spark.catalog.clearCache()
  }

  test("perceptual-hash pairs match the naive aHash reference") {
    val pxGen: Gen[Seq[Int]] = for {
      len <- Gen.choose(64, 200)
      px <- Gen.listOfN(len, Gen.frequency(
        (3, Gen.const(32)), (2, Gen.const(120)), (1, Gen.choose(32, 126))))
    } yield px
    val base = samples(pxGen, 30)
    // perturbed twins: flip a couple of characters
    val twins = base.take(8).map(px =>
      px.updated(1, 33).updated(px.length - 2, 121))
    val corpus = (base ++ twins).zipWithIndex
      .map { case (px, i) => (i.toLong, px.map(_.toChar).mkString) }
    val got = Multimodal.phashPairsOf(corpus.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
      .toSet
    // naive reference: same cells/global-mean/chunk construction
    def chunksOf(text: String): Seq[Long] = {
      val px = text.map(c => (c.toInt / 16).toLong)
      val stride = px.length / 64
      val cells = (0 until 64).map(j =>
        px.slice(j * stride, j * stride + stride).sum / stride)
      val gmean = cells.sum / 64
      (0 until 4).map(k => (0 until 16).map(j =>
        if (cells(16 * k + j) > gmean) 1L << j else 0L).sum)
    }
    val hs = corpus.map { case (id, text) => id -> chunksOf(text) }.toMap
    val expected = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      ca = hs(a); cb = hs(b)
      // blocking requires a shared chunk; at hamming <= 3 pigeonhole
      // guarantees one, so the naive gate is just the hamming filter
      h = ca.zip(cb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y).toLong }.sum
      if h <= Multimodal.PhashMaxHamming
    } yield (a, b, h)).toSet
    assert(expected.nonEmpty, "generator should plant near-dup rasters")
    assert(got == expected)
    spark.catalog.clearCache()
  }
}
