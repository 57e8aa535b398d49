package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Hash.h8

/** Multimodal-column plumbing for the LLM-data-pipeline tier: media is
  * carried as opaque `binary` payloads with a typed metadata struct, and
  * processed by deterministic batch operators whose *decode* step is a
  * STUB (this container ships no image/audio codecs — the Spark-side
  * schema, partitioning, batch shape and the DuckDB-oracle accounting
  * are real; the pixel/sample decoding is a clearly-marked fake).
  *
  * The fixture corpus has no media files, so payloads are minted from
  * the document text's UTF-8 bytes — byte-exact in both engines, which
  * keeps every byte-level statistic oracle-checkable.
  */
object Multimodal {

  /** Attach an opaque binary payload + typed media metadata to each
    * document: payload = UTF-8 bytes of the text (fixture stand-in for
    * image/audio bytes), metadata = deterministic fake dimensions. */
  def withPayload(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          when(pmod(col("doc_id"), lit(3)) === 0, lit("image/png"))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio/wav"))
            .otherwise(lit("video/mp4")).as("mime"),
          (h8("w", col("doc_id")) % 1024 + 64).cast("int").as("width"),
          (h8("h", col("doc_id")) % 1024 + 64).cast("int").as("height"),
          (h8("f", col("doc_id")) % 240 + 1).cast("int").as("n_frames"))
          .as("meta"))

  /** Frame sampling for the "video" payloads: every ceil(n/8)-th frame
    * index — the plumbing a real frame extractor would fan out over. */
  def frameSampleIndices(nFrames: Column): Column = {
    val stride = greatest(lit(1), (nFrames / lit(8)).cast("int"))
    sequence(lit(0), nFrames - 1, stride)
  }

  /** Byte-level media accounting (the oracle-checkable face of the
    * pipeline): payload size, content hash, fake dims, frame-sample
    * count. Everything derives from bytes/md5 — no codecs involved. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    withPayload(spark, dir)
      .select(
        col("doc_id"),
        col("meta.mime").as("mime"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.n_frames").as("n_frames"),
        size(frameSampleIndices(col("meta.n_frames"))).as("n_sampled_frames"))

  /** ======== STUB ========
    * "Resize" an image payload to fit a bounding box: the aspect-ratio
    * arithmetic and metadata rewrite are real (what a resize operator
    * must track); the pixel resampling is NOT performed — payload passes
    * through untouched because no codec exists in this container. */
  def resizeStub(payloads: DataFrame, maxSide: Int = 256): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = least(
      lit(1.0),
      lit(maxSide).cast("double") / greatest(w, h))
    payloads.select(
      col("doc_id"),
      col("payload"), // STUB: bytes unchanged; a real impl resamples here
      struct(
        col("meta.mime").as("mime"),
        floor(w * scale).cast("int").as("width"),
        floor(h * scale).cast("int").as("height"),
        col("meta.n_frames").as("n_frames"))
        .as("meta"))
  }

  /** ======== STUB ========
    * Deterministic fake "decode + feature extract" over payload bytes,
    * shaped like the real thing: a per-partition batch operator (the
    * Scala analog of a vectorized mapInPandas UDF) emitting a fixed-dim
    * feature vector per row. A real implementation would decode pixels /
    * PCM samples here; this stub folds the payload bytes instead. The
    * schema, batch iteration, and partition behavior are production-
    * shaped; ONLY the math inside `fakeFeature` is fake. */
  def featureExtractStub(payloads: DataFrame, dim: Int = 8): DataFrame = {
    import payloads.sparkSession.implicits._
    val out = payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          (id, fakeFeature(bytes, dim))
        }
      }
    out.toDF("doc_id", "feature")
  }

  /** STUB decode: byte-fold features — stands in for pixel decoding. */
  private def fakeFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }
}
