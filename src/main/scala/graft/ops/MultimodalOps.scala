package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (LLM-pipeline extension): treat image/audio/
  * video as opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as BATCHED per-partition transforms.
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): `decodeStub` derives a deterministic fake feature vector
  * from the payload bytes. Everything around it — the binary column, the
  * metadata struct, the partition-wise batching shape (the exact structure a
  * vectorized decoder needs: fixed-size batches per partition, no driver
  * collection) — is real and tested, so swapping in a real codec is a
  * one-function change.
  */
object MultimodalOps {

  /** Attach a binary payload + metadata struct to each document. The payload
    * here is the utf-8 text bytes standing in for real media bytes; metadata
    * mimics a decoded-asset descriptor (mime, byte size, fake dimensions).
    */
  def attachBinary(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("meta", struct(
        when(col("source") === "src0", "image/png")
          .when(col("source") === "src1", "audio/wav")
          .otherwise("video/mp4").as("mime"),
        col("n_bytes").as("n_bytes"),
        (col("n_bytes") % 640 + 1).cast("int").as("width"),
        (col("n_bytes") % 480 + 1).cast("int").as("height")))

  /** Batched per-partition "decode": groups rows into fixed-size batches and
    * maps each batch through the (stubbed) decoder — the same shape a real
    * vectorized image/audio decode takes (decode N assets per native call),
    * with no shuffle and no driver involvement.
    */
  final case class DecodedFeatures(doc_id: Long, n_bytes: Int, features: Array[Float])

  def decodeFeatures(docs: DataFrame, batchSize: Int = 64): Dataset[DecodedFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // === STUB: real implementation decodes the media batch here ===
          // (e.g. JNI/FFI call decoding `batch.map(_._2)` in one shot).
          // The fake derives 8 deterministic floats from the bytes so the
          // pipeline shape and determinism are testable without codecs.
          batch.map { case (id, bytes) => DecodedFeatures(id, bytes.length, decodeStub(bytes)) }
        }
      }
  }

  /** Deterministic fake "decoder": one feature per payload OCTANT — the
    * MD5-61 hash of the chunk's bytes (the same kernel as the dedup family)
    * scaled into [0, 1). Chunk j covers bytes [⌊j·n/8⌋, ⌊(j+1)·n/8⌋), the
    * byte-level shape of per-frame features. Being MD5-based, the whole
    * stub is replayable in SQL (`md5_number_lower` over char substrings —
    * identical to byte chunks for any single-byte encoding), so the query
    * has a full DuckDB oracle instead of a rows-only check.
    */
  private[ops] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    val n = bytes.length
    var j = 0
    while (j < 8) {
      val from = (j.toLong * n / 8).toInt
      val until = ((j + 1).toLong * n / 8).toInt
      val h = graft.functions.Md5Hash61.hash61(java.util.Arrays.copyOfRange(bytes, from, until))
      out(j) = (h.toDouble / 2305843009213693952.0).toFloat // h / 2^61 ∈ [0,1)
      j += 1
    }
    out
  }

  /** "Frame sampling" over a binary payload: every k-th fixed-size chunk —
    * the byte-level shape of video frame extraction, as a column expression
    * (no decode, pure slicing).
    */
  def sampleChunks(docs: DataFrame, chunkBytes: Int = 16, everyK: Int = 4): DataFrame =
    docs
      .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
      .withColumn("n_chunks",
        ceil(length(col("payload")) / lit(chunkBytes.toDouble)).cast("int"))
      .withColumn("sampled_chunks",
        expr(s"transform(filter(sequence(0, n_chunks - 1), i -> i % $everyK = 0), " +
          s"i -> substring(payload, i * $chunkBytes + 1, $chunkBytes))"))
      .select(col("doc_id"), col("n_chunks"), size(col("sampled_chunks")).as("n_sampled"))
}
