package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests for the audit operators: on random inputs the
  * distributed audits must agree with naive single-machine set
  * algebra. Fixed ScalaCheck seeds (no scalatest-plus bridge in the
  * offline cache). */
class AuditPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(9393L + i)))

  private val fdGen: Gen[Seq[(String, String, String)]] = for {
    n <- Gen.choose(1, 80)
    rows <- Gen.listOfN(n, for {
      fd <- Gen.oneOf("f1", "f2", "f3")
      dv <- Gen.choose(0, 9).map(i => s"d$i")
      pv <- Gen.choose(0, 5).map(i => s"p$i")
    } yield (fd, dv, pv))
  } yield rows

  test("fdAuditOf equals naive set algebra on random FD tables") {
    samples(fdGen, 10).foreach { rows =>
      val expected = rows.groupBy(_._1).map { case (fd, rs) =>
        val byDet = rs.groupBy(_._2)
        val violating = byDet.filter(_._2.map(_._3).distinct.size > 1)
        fd -> ((byDet.size.toLong,
          violating.size.toLong,
          byDet.values.map(_.map(_._3).distinct.size.toLong).max,
          violating.values.map(_.size.toLong).sum,
          if (violating.isEmpty) 1L else 0L))
      }
      val got = DataQuality.fdAuditOf(rows.toDF("fd", "dv", "pv")).collect()
        .map(r => r.getAs[String]("fd") ->
          ((r.getAs[Long]("n_det_values"), r.getAs[Long]("n_violating_det"),
            r.getAs[Long]("max_dep_per_det"),
            r.getAs[Long]("n_rows_in_violation"),
            r.getAs[Long]("holds")))).toMap
      assert(got == expected, s"rows=$rows")
    }
  }

  private val refGen: Gen[(Seq[Long], Seq[Long])] = for {
    nc <- Gen.choose(0, 60)
    child <- Gen.listOfN(nc, Gen.choose(0L, 19L))
    np <- Gen.choose(0, 12)
    parent <- Gen.listOfN(np, Gen.choose(0L, 19L))
  } yield (child, parent.distinct)

  test("refIntegrityOf counts orphans exactly on random key sets") {
    samples(refGen, 10).foreach { case (child, parent) =>
      val orphans = child.filterNot(parent.contains)
      val r = DataQuality.refIntegrityOf("t",
        child.toDF("fk"), parent.toDF("pk")).head()
      assert(r.getAs[Long]("n_child_rows") == child.size.toLong)
      assert(r.getAs[Long]("n_orphan_rows") == orphans.size.toLong)
      assert(r.getAs[Long]("n_orphan_keys") ==
        orphans.distinct.size.toLong, s"child=$child parent=$parent")
    }
  }
}
