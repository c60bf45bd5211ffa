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

  /** Registered form: feature vector unpacked to scalar columns. The
    * driver's rows-only check sorts every column in pandas, where array
    * cells are unhashable — registered outputs must be scalar. */
  def extractFeaturesFlat(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).select(
      col("doc_id"), col("mime"), col("n_bytes"), col("width"), col("height"),
      element_at(col("features"), 1).as("f_len"),
      element_at(col("features"), 2).as("f_mean"),
      element_at(col("features"), 3).as("f_var"),
      element_at(col("features"), 4).as("f_checksum"))

  /** Media metadata (no decode): payload size, MIME, derived dimensions.
    * This is the SQL-expressible half of the multimodal pipeline — the
    * codec stays in `extractFeatures`, everything schema/metadata-shaped
    * is a plain projection and gets a DuckDB oracle. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("mime"),
      length(col("content")).as("n_bytes"),
      (lit(64) + col("doc_id") % 7).cast("int").as("frame_rate"))

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> ((s, d) => extractFeaturesFlat(s, d)),
    "multimodal_meta" -> ((s, d) => mediaMeta(s, d)))

  // multimodal_features has no oracle: the decode stage is deliberately
  // outside SQL (it models a codec UDF); covered by MlSpec golden
  // assertions instead. The metadata projection is oracle-checked.
  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       CAST(64 + doc_id % 7 AS INT) AS frame_rate
        |FROM documents""".stripMargin)
}
