package graft.ml

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property test for the fused label-propagation clustering: on random
  * pair graphs, [[Dedup.clustersOf]] must agree with a naive
  * single-machine union-find — same membership, same min-id canonical
  * labels. Guards the round-9 fusion (neighbor-min + pointer-jump as
  * one union + grouped min) against semantic drift. Fixed ScalaCheck
  * seeds (no scalatest-plus bridge in the offline cache). */
class DedupClusterPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  /** Random edge list over a small id domain so dense components, long
    * chains, self-contained stars, and isolated pairs all occur. */
  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    nEdges <- Gen.choose(0, 60)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, 39L)
      b <- Gen.choose(0L, 39L) if b != a
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("clustersOf equals naive union-find on random graphs (min-id labels)") {
    samples(graphGen, 12).foreach { edges =>
      val expected = unionFind(edges)
      val got = Dedup.clustersOf(edges.toDF("doc_a", "doc_b")).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
      assert(got == expected, s"edges=$edges")
    }
  }
}
