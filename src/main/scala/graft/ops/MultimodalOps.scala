package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing (SURVEY.md §2B X29): media carried as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted inside
  * partition-parallel tasks.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs on the
  * offline classpath): it derives deterministic fake dimensions from the
  * payload so the Spark-side plumbing — binary schema, typed Dataset
  * boundary, mapPartitions batch shape, partition parallelism — is real and
  * oracle-testable. A production decoder replaces only [[stubDecode]].
  */
object MultimodalOps {

  /** Typed row produced by the "decoder". */
  final case class MediaMeta(doc_id: Long, byte_len: Int, width: Int,
      height: Int, channels: Int, n_frames: Int)

  /** STUB decode: a real implementation would parse the container header
    * (JPEG/PNG/WAV/MP4) from `bytes`; here dimensions are a deterministic
    * function of the payload so results are reproducible and verifiable. */
  def stubDecode(docId: Long, bytes: Array[Byte]): MediaMeta =
    MediaMeta(
      doc_id = docId,
      byte_len = bytes.length,
      width = 32 + (docId % 96).toInt,
      height = 32 + ((docId / 2) % 96).toInt,
      channels = 3,
      n_frames = bytes.length / 64) // "frame-sample": one frame per 64 bytes

  /** X29 — binary ingestion + decode + metadata projection: text re-encoded
    * as a binary payload stands in for image/audio bytes; decode runs
    * per-partition over the typed boundary (the mapPartitions batch shape a
    * Pandas-UDF/Arrow path would also use). */
  def x29Multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bin = t(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("media_bytes"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** X29 — multimodal columns flowing through relational ops: join decoded
    * metadata back to the catalog and aggregate by shape bucket, proving
    * binary-derived columns compose with groupBy/join like any other. */
  def x29bShapeStats(s: SparkSession, d: String): DataFrame = {
    val meta = x29Multimodal(s, d)
    val docs = t(s, d, "documents").select(col("doc_id"), col("lang"))
    meta.join(docs, "doc_id")
      .groupBy(col("lang"), (col("width") >= 80).as("is_wide"))
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("lang"), col("is_wide"))
  }

  /** X29 — frame sampling: every 4th frame of each media payload as
    * (frame index, byte offset, length) — the metadata-driven stride
    * sample a video pipeline hands to the decoder, computed without
    * touching the bytes (the decoder seeks the offsets later). The
    * explode stays proportional to frames KEPT, not frames present. */
  def x29cFrameSample(s: SparkSession, d: String): DataFrame =
    x29Multimodal(s, d)
      .select(col("doc_id"), col("n_frames"))
      .filter(col("n_frames") > 0) // sequence(0, -1) would step backwards
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * 64)
      .withColumn("frame_bytes", lit(64))
      .orderBy(col("doc_id"), col("frame_idx"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x29_multimodal_decode" -> (x29Multimodal _),
    "x29b_multimodal_stats" -> (x29bShapeStats _),
    "x29c_frame_sample" -> (x29cFrameSample _))

  val oracles: Map[String, String] = Map(
    "x29_multimodal_decode" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        | CAST(32 + doc_id % 96 AS INTEGER) AS width,
        | CAST(32 + (doc_id // 2) % 96 AS INTEGER) AS height,
        | 3 AS channels,
        | CAST(octet_length(encode(text)) // 64 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x29b_multimodal_stats" ->
      """SELECT lang, (32 + doc_id % 96) >= 80 AS is_wide, count(*) AS n,
        | CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
        | CAST(sum(CAST(octet_length(encode(text)) // 64 AS BIGINT)) AS BIGINT) AS total_frames
        |FROM documents GROUP BY 1, 2 ORDER BY lang, is_wide""".stripMargin,
    "x29c_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) // 64 AS n_frames
        |  FROM documents
        |  WHERE octet_length(encode(text)) // 64 > 0)
        |SELECT doc_id,
        | CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx,
        | CAST(unnest(range(0, n_frames, 4)) * 64 AS INTEGER) AS byte_offset,
        | 64 AS frame_bytes
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin)
}
