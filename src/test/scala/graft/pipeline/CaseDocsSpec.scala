package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkSpec

/** Nested case-document invariants: history ordering, empty-history
  * handling, extraction-compiler golden values. */
class CaseDocsSpec extends SparkSpec {

  test("case documents: one row per order, history sorted by linenumber") {
    val docs = CaseDocs.caseDocuments(spark, sf).cache()
    assert(docs.count() == graft.Tables.orders(spark, sf).count())
    val hist = docs.filter(size(col("history")) > 1)
      .select(col("history")).limit(50).collect()
    hist.foreach { r =>
      val lns = r.getSeq[Row](0).map(_.getAs[Int]("l_linenumber"))
      assert(lns.zip(lns.tail).forall { case (a, b) => a <= b })
    }
  }

  test("empty-history cases keep an empty array, not null") {
    val docs = CaseDocs.caseDocuments(spark, sf)
    assert(docs.filter(col("history").isNull).count() == 0)
    assert(docs.filter(size(col("history")) === 0).count() > 0,
      "testdata contains orders without lineitems")
  }

  test("summary text has the expected shape for empty and non-empty history") {
    val st = CaseDocs.summaryText(spark, sf)
      .collect().map(r => r.getAs[Long]("case_ref") -> r.getAs[String]("summary_text"))
    st.foreach { case (ref, s) =>
      assert(s.startsWith(s"case $ref | "))
      assert(!s.endsWith(" | "), s"trailing separator on $ref: '$s'")
    }
  }

  test("canonical-field compiler: party lookup equals the flat join answer") {
    val viaConfig = CaseDocs.canonicalFields(spark, sf)
      .select("case_ref", "client_name")
    val flat = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"), "left_outer")
      .select(col("o_orderkey").as("case_ref"), col("c_name").as("expected"))
    val diff = viaConfig.join(flat, "case_ref")
      .filter(!(col("client_name") <=> col("expected"))).count()
    assert(diff == 0)
  }

  test("unknown extraction method fails fast") {
    intercept[IllegalArgumentException] {
      CanonicalConfig.compile(
        CanonicalConfig.FieldSpec("x", "bogus_method", "p", "string"))
    }
  }
}
