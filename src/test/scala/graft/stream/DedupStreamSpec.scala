package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.DedupOps

/** The streaming incremental dedup twin is verified against the one-shot
  * batch operator: feeding the batch slice through N micro-batches and
  * unioning the per-batch pair outputs must reproduce
  * `incrementalMinhashPairs(corpus, batch)` EXACTLY (delta identity — the
  * later of a pair's two batches emits it, once). Replay safety is
  * exercised by re-running a batch id against an index that already holds
  * its rows.
  */
class DedupStreamSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("micro-batched incremental dedup == one-shot batch delta") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batchAll = docs.filter(col("doc_id") % 10 === 0)
    val tmp = Files.createTempDirectory("dedup_stream").toString
    DedupStream.seedIndex(corpus, s"$tmp/index")
    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.run(
      mem.toDF().toDF("doc_id", "text"),
      s"$tmp/index", s"$tmp/pairs", s"$tmp/ckpt")
    // three micro-batches split by doc_id — arrival order is ingest order
    val rows = batchAll.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
      mem.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.read.parquet(s"$tmp/pairs")
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = DedupOps.incrementalMinhashPairs(corpus, batchAll)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want,
      s"streamed != batch: only-stream=${(got -- want).take(3)} " +
        s"only-batch=${(want -- got).take(3)}")
    assert(got.nonEmpty, "the split must produce at least one pair")
  }

  test("replaying a micro-batch is idempotent (partitions replaced, no double pairs)") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0).limit(40)
    val tmp = Files.createTempDirectory("dedup_replay").toString
    DedupStream.seedIndex(corpus, s"$tmp/index")
    DedupStream.processBatch(batch.toDF(), 0L, s"$tmp/index", s"$tmp/pairs")
    val first = spark.read.parquet(s"$tmp/pairs")
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    // crash-replay: the index ALREADY contains src_batch=0 rows; the probe
    // must exclude them and the writes must replace, not append
    DedupStream.processBatch(batch.toDF(), 0L, s"$tmp/index", s"$tmp/pairs")
    val second = spark.read.parquet(s"$tmp/pairs")
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(first == second, "replay changed the pair output")

    // the OTHER crash point: pairs committed but the index contribution
    // lost (died between the two writes). Replay must restore the index
    // partitions and leave the pair output byte-identical.
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$tmp/index/bands/src_batch=0")).deleteRecursively()
    new Directory(new java.io.File(s"$tmp/index/sets/src_batch=0")).deleteRecursively()
    DedupStream.processBatch(batch.toDF(), 0L, s"$tmp/index", s"$tmp/pairs")
    val third = spark.read.parquet(s"$tmp/pairs")
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(first == third, "post-crash replay changed the pair output")
    val idxBatches = spark.read.parquet(s"$tmp/index/bands")
      .select(col("src_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(idxBatches == Set(-1L, 0L), s"index partitions after replay: $idxBatches")
  }
}
