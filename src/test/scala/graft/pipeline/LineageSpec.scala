package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LineageSpec extends SparkSpec {

  test("training-corpus flagship: manifest conserves the gated survivors") {
    val docs = graft.Tables.documents(spark, sf)
    val manifest = Lineage.trainingCorpus(spark, sf).collect()
    assert(manifest.nonEmpty)
    assert(manifest.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val", "test")))
    assert(manifest.map(_.getAs[String]("source")).toSet ==
      docs.select("source").distinct().collect()
        .map(_.getString(0)).toSet)
    // the gate + dedup only ever drop documents
    val kept = manifest.map(_.getAs[Long]("n_docs")).sum
    assert(kept > 0 && kept <= docs.count())
    // token totals are the sum over kept docs, so every manifest row
    // carries at least 10 tokens per doc (the gate's floor)
    manifest.foreach(r =>
      assert(r.getAs[Long]("n_tokens") >= 10 * r.getAs[Long]("n_docs")))
  }

  test("reverse-kNN counts: complete over the corpus, edges conserved") {
    val emb = graft.Tables.embeddings(spark, sf)
    val counts = graft.ml.Dedup.reverseKnnCounts(spark, sf)
    assert(counts.count() == emb.count()) // every vector has a row
    val edgeTotal = graft.ml.Dedup.embeddingKnnGraph(spark, sf).count()
    spark.catalog.clearCache()
    assert(counts.agg(sum("n_referrers")).head.getLong(0) == edgeTotal)
    spark.catalog.clearCache()
  }
}
