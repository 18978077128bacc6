package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("attachBinary: payload bytes + metadata struct are consistent") {
    val r = MultimodalOps.attachBinary(docs)
      .select("doc_id", "n_bytes", "meta.mime", "meta.width", "meta.height")
      .filter(col("doc_id") === 0).collect()(0)
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[Int]("width") == (r.getAs[Long]("n_bytes") % 640 + 1).toInt)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(r.getAs[String]("mime")))
  }

  test("decodeFeatures: deterministic, complete, 8-dim, batch-shaped") {
    val a = MultimodalOps.decodeFeatures(docs, batchSize = 64).collect()
    val b = MultimodalOps.decodeFeatures(docs, batchSize = 7).collect() // batch size must not change results
    assert(a.length == docs.count())
    assert(a.forall(_.features.length == 8))
    val am = a.map(d => d.doc_id -> d.features.toSeq).toMap
    val bm = b.map(d => d.doc_id -> d.features.toSeq).toMap
    assert(am == bm)
  }

  test("parseHeader reads REAL format bytes: genuine PNG IHDR and BMP info header") {
    // a real 1920×1080 8-bit truecolor PNG's first 25 bytes, written from
    // the public spec (signature, IHDR length 13, 'IHDR', BE dims, depth)
    val png = Array(
      0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,  // signature
      0x00, 0x00, 0x00, 0x0D,                        // IHDR length = 13
      'I', 'H', 'D', 'R',
      0x00, 0x00, 0x07, 0x80,                        // width 1920 (BE)
      0x00, 0x00, 0x04, 0x38,                        // height 1080 (BE)
      0x08).map(_.toByte)                            // bit depth 8
    assert(MultimodalOps.parseHeader(png) == (("png", Some(1920), Some(1080), Some(8))))
    // a real 2×3 24bpp BMP header: BITMAPFILEHEADER + BITMAPINFOHEADER,
    // little-endian throughout
    val bmp = Array(
      'B', 'M', 0x46, 0x00, 0x00, 0x00,              // size 70 (LE)
      0x00, 0x00, 0x00, 0x00, 0x36, 0x00, 0x00, 0x00, // reserved, offset 54
      0x28, 0x00, 0x00, 0x00,                        // info size 40 (LE)
      0x02, 0x00, 0x00, 0x00,                        // width 2 (LE)
      0x03, 0x00, 0x00, 0x00,                        // height 3 (LE)
      0x01, 0x00, 0x18, 0x00,                        // planes 1, bpp 24 (LE)
      0x00, 0x00).map(_.toByte)
    assert(MultimodalOps.parseHeader(bmp) == (("bmp", Some(2), Some(3), Some(24))))
    // opaque bytes: stub path, null dims
    assert(MultimodalOps.parseHeader("not media".getBytes) ==
      (("opaque", None, None, None)))
  }

  test("parseHeader walks REAL JPEG markers to SOF: APP0/COM/DQT then SOF0") {
    // the metadata section a real camera/encoder writes: SOI, JFIF APP0,
    // a comment, a quantization table, then the SOF0 frame header. Every
    // segment length is the real BE-u16-including-itself encoding
    // (ITU T.81 §B.2); dims are 640×480, height stored BEFORE width.
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xFF).toByte) ++ payload
    val jpeg =
      Array(0xFF, 0xD8).map(_.toByte) ++                      // SOI
      seg(0xE0, "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      seg(0xFE, "shot on a real camera".getBytes) ++          // COM, odd length
      seg(0xDB, Array[Byte](0) ++ Array.fill[Byte](64)(3)) ++ // DQT
      seg(0xC0, Array[Byte](8,                                // precision 8
        0x01.toByte, 0xE0.toByte,                             // height 480 (BE)
        0x02.toByte, 0x80.toByte,                             // width 640 (BE)
        3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))               // 3 components
    assert(MultimodalOps.parseHeader(jpeg) == (("jpeg", Some(640), Some(480), Some(8))))
    // progressive SOF2 with 12-bit precision and a fill byte before SOF
    val prog =
      Array(0xFF, 0xD8).map(_.toByte) ++
      seg(0xFE, "x".getBytes) ++
      Array(0xFF.toByte) ++ // legal fill byte before the next marker
      seg(0xC2, Array[Byte](12, 0x00, 0x64, 0x00, 0x32, 1, 1, 0x11, 0)) // 100h×50w, 1 comp
    assert(MultimodalOps.parseHeader(prog) == (("jpeg", Some(50), Some(100), Some(12))))
    // SOS before any SOF (dims unreachable in a header scan) → null dims
    val sosFirst = Array(0xFF, 0xD8).map(_.toByte) ++
      seg(0xDA, Array[Byte](1, 1, 0)) ++ Array[Byte](1, 2, 3)
    assert(MultimodalOps.parseHeader(sosFirst) == (("jpeg", None, None, None)))
    // truncated mid-segment → null dims, never a throw
    assert(MultimodalOps.parseHeader(jpeg.take(12)) == (("jpeg", None, None, None)))
  }

  test("attachMediaHeader → decodeDims round-trips dims through real byte parsing") {
    val decoded = MultimodalOps.decodeDims(
        MultimodalOps.attachMediaHeader(docs), batchSize = 16)
      .collect().map(d => d.doc_id -> d).toMap
    val bySource = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bySource.values.exists(_ == "src0") && bySource.values.exists(_ == "src1")
      && bySource.values.exists(_ == "src2"),
      "fixture must cover png AND bmp AND jpeg sources")
    bySource.foreach { case (id, src) =>
      val d = decoded(id)
      src match {
        case "src0" =>
          assert(d.format == "png" && d.width == Some((id % 640 + 1).toInt)
            && d.height == Some((id % 480 + 1).toInt)
            && d.bit_depth == Some(if (id % 2 == 0) 8 else 16), s"doc $id: $d")
        case "src1" =>
          assert(d.format == "bmp" && d.width == Some((id % 640 + 1).toInt)
            && d.height == Some((id % 480 + 1).toInt)
            && d.bit_depth == Some(if (id % 2 == 0) 24 else 32), s"doc $id: $d")
        case "src2" =>
          assert(d.format == "jpeg" && d.width == Some((id % 640 + 1).toInt)
            && d.height == Some((id % 480 + 1).toInt)
            && d.bit_depth == Some(if (id % 2 == 0) 8 else 12), s"doc $id: $d")
        case _ =>
          assert(d.format == "opaque" && d.width.isEmpty, s"doc $id: $d")
      }
    }
  }

  test("sampleChunks: every 4th 16-byte chunk is sampled") {
    val rows = MultimodalOps.sampleChunks(docs).collect()
    assert(rows.forall { r =>
      val n = r.getAs[Int]("n_chunks"); val s = r.getAs[Int]("n_sampled")
      s == (n + 3) / 4
    })
  }
}
