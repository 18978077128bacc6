package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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

  /** Synthesize a VALID media header per document — the fixture for the
    * real header decode in [[decodeDims]]. `src0` docs get a PNG signature +
    * IHDR chunk (width/height as BIG-endian u32 at offsets 16/20, bit depth
    * at 24 — the public PNG layout), `src1` docs get a BMP file header +
    * BITMAPINFOHEADER (width/height as LITTLE-endian i32 at offsets 18/22,
    * bits-per-pixel as LE u16 at 28), `src2` docs get a JPEG prefix — SOI,
    * a JFIF APP0, a VARIABLE-length COM segment (length derived from
    * doc_id, so a fixed-offset "parser" cannot fake the walk), a DQT, then
    * SOF0 (baseline, 8-bit) or SOF2 (progressive, 12-bit) carrying height
    * THEN width as big-endian u16 (the JPEG field order) — everything else
    * keeps opaque text bytes. Dimensions derive deterministically from
    * `doc_id`, so an oracle can state the expected decode without byte math
    * while the Spark side only learns them by PARSING the bytes it just
    * wrote — endianness, offset, or marker-walk mistakes in either
    * direction break the round trip.
    *
    * Byte assembly is pure codegen'd column work: `unhex(lpad(hex(x)))` is
    * the int→big-endian-bytes bridge, LE is the same four hex pairs
    * reversed. No UDF, no driver loop.
    */
  def attachMediaHeader(docs: DataFrame): DataFrame = {
    val w = (col("doc_id") % 640 + 1).cast("int")
    val h = (col("doc_id") % 480 + 1).cast("int")
    // PNG bit depth alternates 8/16; BMP bits-per-pixel alternates 24/32;
    // JPEG precision alternates 8 (SOF0 baseline) / 12 (SOF2 progressive)
    val pngDepth = when(col("doc_id") % 2 === 0, 8).otherwise(16).cast("int")
    val bmpBpp = when(col("doc_id") % 2 === 0, 24).otherwise(32).cast("int")
    def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
    def be16(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
    def le32(c: Column): Column = {
      val hx = lpad(hex(c), 8, "0")
      unhex(concat(substring(hx, 7, 2), substring(hx, 5, 2),
        substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    def u8(c: Column): Column = unhex(lpad(hex(c), 2, "0"))
    val pngHeader = concat(
      lit(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)),
      lit(Array[Byte](0, 0, 0, 13)), lit("IHDR".getBytes("US-ASCII")),
      be32(w), be32(h), u8(pngDepth),
      // color type 2 (truecolor), compression 0, filter 0, interlace 0
      lit(Array[Byte](2, 0, 0, 0)))
    val bmpHeader = concat(
      lit("BM".getBytes("US-ASCII")),
      le32(lit(54).cast("int")),        // file size (header-only fixture)
      lit(Array[Byte](0, 0, 0, 0)),     // reserved
      le32(lit(54).cast("int")),        // pixel-data offset
      le32(lit(40).cast("int")),        // BITMAPINFOHEADER size
      le32(w), le32(h),
      lit(Array[Byte](1, 0)),           // planes = 1 (LE u16)
      u8(bmpBpp), lit(Array[Byte](0)))  // bpp LE u16 (high byte 0)
    // JPEG: a segment's 2-byte length covers itself + payload (not the
    // marker). COM payload length varies with doc_id to force a real walk.
    val nCom = (col("doc_id") % 17 + 1).cast("int")
    val sofMarker = when(col("doc_id") % 2 === 0, 0xC0).otherwise(0xC2).cast("int")
    val jpegPrecision = when(col("doc_id") % 2 === 0, 8).otherwise(12).cast("int")
    val jpegHeader = concat(
      lit(Array(0xFF, 0xD8).map(_.toByte)),                 // SOI
      lit(Array(0xFF, 0xE0, 0x00, 0x10).map(_.toByte)),     // APP0, len 16
      lit("JFIF".getBytes("US-ASCII")), lit(Array[Byte](0)),
      lit(Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0)),          // v1.1, no density/thumb
      lit(Array[Byte](0xFF.toByte, 0xFE.toByte)),           // COM marker
      be16(nCom + 2), encode(repeat(lit("x"), nCom), "UTF-8").cast("binary"),
      lit(Array(0xFF, 0xDB, 0x00, 0x43, 0x00).map(_.toByte)), // DQT, len 67, pq/tq
      encode(repeat(lit("q"), 64), "UTF-8").cast("binary"), // dummy 8-bit q-table
      lit(Array[Byte](0xFF.toByte)), u8(sofMarker),         // SOF0 | SOF2
      lit(Array[Byte](0, 17)),                              // len 8 + 3·3
      u8(jpegPrecision), be16(h), be16(w),                  // precision, HEIGHT, WIDTH
      lit(Array[Byte](3)),                                  // 3 components (YCbCr)
      lit(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)))
    docs.withColumn("payload",
      when(col("source") === "src0", pngHeader)
        .when(col("source") === "src1", bmpHeader)
        .when(col("source") === "src2", jpegHeader)
        .otherwise(encode(col("text"), "UTF-8").cast("binary")))
  }

  /** Decoded header dimensions; `None` columns mean the format is opaque to
    * the header parser (the disclosed stub path). */
  final case class DecodedDims(doc_id: Long, format: String,
                               width: Option[Int], height: Option[Int],
                               bit_depth: Option[Int])

  /** REAL header decode over the binary `payload` column: PNG and BMP
    * dimensions parsed at their public fixed offsets (PNG IHDR big-endian,
    * BMP info-header little-endian) in pure JVM byte arithmetic — no codec
    * dependency — batched per partition exactly like [[decodeFeatures]], so
    * swapping in a full pixel decoder keeps the same plumbing. Unknown
    * formats fall through to the disclosed opaque stub (null dims) instead
    * of failing the batch.
    */
  def decodeDims(docs: DataFrame, batchSize: Int = 64): Dataset[DecodedDims] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (fmt, w, h, d) = parseHeader(bytes)
            DecodedDims(id, fmt, w, h, d)
          }
        }
      }
  }

  /** Pure-byte header parse — PNG: 8-byte signature then IHDR (width BE u32
    * at 16, height BE u32 at 20, bit depth at 24); BMP: "BM" then width LE
    * i32 at 18, height LE i32 at 22, bpp LE u16 at 28; JPEG: SOI then a
    * marker WALK to the first SOFn frame header (see [[jpegSofDims]]).
    * Public format knowledge only (PNG spec §11.2.2, BMP BITMAPINFOHEADER
    * layout, ITU T.81 §B.2).
    */
  private[ops] def parseHeader(bytes: Array[Byte])
      : (String, Option[Int], Option[Int], Option[Int]) = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val isPng = bytes.length >= 25 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
      u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
      u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R'
    val isJpeg = !isPng && bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8
    val isBmp = !isPng && !isJpeg && bytes.length >= 30 && u8(0) == 'B' && u8(1) == 'M'
    if (isPng) ("png", Some(be32(16)), Some(be32(20)), Some(u8(24)))
    else if (isJpeg) jpegSofDims(bytes) match {
      // a JPEG prefix with no reachable SOF (truncated, or SOS first) keeps
      // the format tag but degrades to null dims — same defensive contract
      // as the opaque branch, never a thrown batch
      case Some((w, h, prec)) => ("jpeg", Some(w), Some(h), Some(prec))
      case None => ("jpeg", None, None, None)
    }
    else if (isBmp) ("bmp", Some(le32(18)), Some(le32(22)), Some(le16(28)))
    else ("opaque", None, None, None)
  }

  /** JPEG frame-dimension scan (ITU T.81 §B.2): walk the marker segments
    * after SOI — each marked `FF xx` with a big-endian u16 length that
    * counts itself plus payload — to the first SOFn (C0–CF minus C4/C8/CC,
    * which are DHT/JPG/DAC, not frame headers). The SOF payload is
    * precision u8, then HEIGHT, then WIDTH (both BE u16 — the reverse of
    * most formats' order). Standalone markers (TEM, RSTn, SOI) have no
    * length and are skipped; fill bytes (repeated FF) before a marker are
    * legal padding; EOI or SOS before any SOF means the dimensions are
    * unreachable in a header-only scan → None.
    */
  private[ops] def jpegSofDims(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    var i = 2 // past SOI
    while (i + 1 < bytes.length) {
      if (u8(i) != 0xFF) return None // not at a marker: corrupt stream
      var j = i + 1
      while (j < bytes.length && u8(j) == 0xFF) j += 1 // fill bytes
      if (j >= bytes.length) return None
      val m = u8(j)
      if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
        if (j + 7 >= bytes.length) return None // truncated SOF
        return Some((be16(j + 6), be16(j + 4), u8(j + 3))) // (width, height, precision)
      } else if (m == 0xD9 || m == 0xDA) {
        return None // EOI / SOS: no frame header in the metadata section
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) {
        i = j + 1 // standalone marker, no length field
      } else {
        if (j + 2 >= bytes.length) return None
        val len = be16(j + 1)
        if (len < 2) return None // malformed length
        i = j + 1 + len
      }
    }
    None
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
