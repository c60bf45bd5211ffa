package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column pipeline: media payloads as opaque binary columns +
  * typed metadata, with decode/feature-extraction as a batched
  * mapPartitions stage (the Scala analog of a vectorized pandas-UDF
  * stage). The reference stores documents as raw bytes with MIME metadata
  * (caseguard/proclaim/soap_downloader.py FORMAT_TO_MIME;
  * technical-details.md:92-163) and parses them through an external
  * service (docproc/format_config.py:147-230).
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): `decodeStub` derives deterministic pseudo-features from
  * the bytes. Everything around it — binary column, schema, partition-wise
  * batching, feature vector shape — is the real Spark plumbing a decoder
  * would plug into.
  */
object Multimodal {

  /** Input row: media id + raw bytes + declared MIME. */
  final case class MediaRecord(doc_id: Long, content: Array[Byte], mime: String)

  /** Output row: metadata + fixed-width feature vector. */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  /** STUB decoder — stands in for an image/audio codec. Deterministic pure
    * function of the bytes: byte-histogram moments as "features",
    * byte-length-derived "dimensions". A real deployment swaps only this
    * function; the pipeline shape is unchanged. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.content.length
    var sum = 0L; var sumSq = 0L
    var i = 0
    while (i < n) {
      val b = r.content(i) & 0xff
      sum += b; sumSq += b.toLong * b
      i += 1
    }
    val mean = if (n > 0) sum.toDouble / n else 0.0
    val variance = if (n > 0) sumSq.toDouble / n - mean * mean else 0.0
    MediaFeatures(
      r.doc_id, r.mime, n,
      width = 64 + (n % 512), height = 64 + ((n / 7) % 512),
      features = Array(
        n.toFloat, mean.toFloat, variance.toFloat,
        (sum % 1000000007L).toFloat))
  }

  /** Media table synthesized from documents: text bytes as the binary
    * payload, MIME assigned round-robin. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** The decode/feature stage: partition-batched typed map. Narrow (no
    * shuffle); at scale this is where a codec library would run once per
    * executor over arrow-sized batches. */
  def extractFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> ((s, d) => extractFeatures(s, d)))

  // No oracle: the decode stage is deliberately outside SQL (it models a
  // codec UDF); covered by MlSpec golden assertions instead.
  val oracles: Map[String, String] = Map.empty
}
