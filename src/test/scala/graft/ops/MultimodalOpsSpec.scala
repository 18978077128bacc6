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

  test("sampleChunks: every 4th 16-byte chunk is sampled") {
    val rows = MultimodalOps.sampleChunks(docs).collect()
    assert(rows.forall { r =>
      val n = r.getAs[Int]("n_chunks"); val s = r.getAs[Int]("n_sampled")
      s == (n + 3) / 4
    })
  }
}
