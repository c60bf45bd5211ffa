package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property test for multi-source BFS: on random undirected graphs with
  * random seed sets, [[Graph.bfsDistancesOf]] must agree with a naive
  * single-machine layered BFS — same reached set, same hop distances.
  * Node ids are multiples of 10 so the customer/supplier decode is the
  * identity on entity_id. Fixed ScalaCheck seeds (no scalatest-plus
  * bridge in the offline cache). */
class BfsPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(8181L + i)))

  private val caseGen: Gen[(Seq[(Long, Long)], Seq[Long])] = for {
    nEdges <- Gen.choose(0, 50)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(1L, 30L)
      b <- Gen.choose(1L, 30L) if b != a
    } yield (a * 10, b * 10))
    nSeeds <- Gen.choose(1, 4)
    seeds <- Gen.listOfN(nSeeds, Gen.choose(1L, 30L).map(_ * 10))
  } yield (edges, seeds.distinct)

  private def naiveBfs(edges: Seq[(Long, Long)],
      seeds: Seq[Long]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).distinct }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> d)
      frontier = next
    }
    dist
  }

  test("bfsDistancesOf equals naive layered BFS on random graphs and seeds") {
    samples(caseGen, 10).foreach { case (edges, seeds) =>
      val expected = naiveBfs(edges, seeds)
      val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val got = Graph.bfsDistancesOf(und.toDF("src", "dst"),
          seeds.toDF("node"), rounds = 40).collect()
        .map(r => r.getAs[Long]("entity_id") * 10 -> r.getAs[Long]("dist"))
        .toMap
      assert(got == expected, s"edges=$edges seeds=$seeds")
    }
  }
}
