package graft.ml

import graft.SparkSpec

/** The multimodal pipeline's plumbing is real (binary column, typed
  * partition-batched map); only the codec is stubbed. These tests pin the
  * stub's determinism and the end-to-end schema/row contract. */
class MultimodalSpec extends SparkSpec {

  test("decodeStub is a deterministic pure function of the bytes") {
    val r = Multimodal.MediaRecord(7L, "hello world".getBytes("UTF-8"), "image/png")
    val a = Multimodal.decodeStub(r)
    val b = Multimodal.decodeStub(r)
    assert(a.n_bytes == 11)
    assert(a.features.toSeq == b.features.toSeq)
    assert(a.width == b.width && a.height == b.height)
    assert(a.features.length == 4)
  }

  test("feature extraction runs end-to-end over the media table") {
    val feats = Multimodal.extractFeatures(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf).count()
    assert(feats.length == docs)
    feats.foreach { r =>
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(Seq("image/png", "audio/wav", "video/mp4")
        .contains(r.getAs[String]("mime")))
      assert(r.getSeq[Float](r.fieldIndex("features")).length == 4)
    }
  }

  test("n_bytes equals the UTF-8 byte length of the source text") {
    import org.apache.spark.sql.functions._
    val joined = Multimodal.extractFeatures(spark, sf)
      .join(graft.Tables.documents(spark, sf), "doc_id")
      .select(col("n_bytes"), octet_length(col("text")).as("expected"))
      .collect()
    joined.foreach(r => assert(r.getAs[Int]("n_bytes") == r.getAs[Int]("expected")))
  }
}
