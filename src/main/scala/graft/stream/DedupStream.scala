package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{DedupOps, TextOps}

/** Streaming incremental near-duplicate detection — the CONTINUOUS-ingest
  * form of [[graft.ops.DedupOps.incrementalMinhashPairs]]: micro-batches of
  * new documents probe a GROWING on-disk LSH index (seeded from the
  * standing corpus), emit verified near-dup pairs for everything ingested
  * so far, and append their own signatures to the index — the shape a
  * production pipeline runs between the daily-batch and the
  * per-event extremes.
  *
  * Exactly-once contract (the idempotentHourlySink discipline): every
  * micro-batch writes BOTH its pair output and its index contribution as
  * `src_batch=<id>` partitions with dynamic partition overwrite, and the
  * probe EXCLUDES the current batch id from the index read — so a batch
  * replayed after a crash (at any point between the two writes and the
  * checkpoint commit) REPLACES its own partitions and never double-pairs
  * against its own half-written index rows.
  *
  * Pair-uniqueness invariant: a pair is emitted exactly once, by the LATER
  * of its two documents' batches (corpus rows live in the seed partition
  * `src_batch=-1`). Unioning the per-batch outputs therefore reproduces
  * the one-shot batch operator's result EXACTLY — the delta identity,
  * pinned by DedupStreamSpec against `incrementalMinhashPairs` on the
  * same corpus/batch split.
  *
  * Scale shape: identical to the batch probe — band keys and doc ids in
  * every exchange, shingle-hash sets only in the per-pair verification
  * join, the index read partition-pruned by `src_batch`.
  */
object DedupStream {

  private def sigs(docs: DataFrame, k: Int): DataFrame = {
    graft.functions.MinHashFunctions.register(docs.sparkSession)
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("hs", expr("shingle_hashes(toks, 3)"))
      .filter(size(col("hs")) > 0)
      .withColumn("sig", expr(s"minhash_sig(hs, $k)"))
      .select(col("doc_id"), col("hs"), col("sig"))
  }

  private def bandsOf(s: DataFrame, k: Int, bands: Int): DataFrame =
    s.select(col("doc_id"),
      posexplode(expr(s"band_hashes(sig, $bands, ${k / bands})"))
        .as(Seq("band", "band_key")))

  private def writePartition(df: DataFrame, dir: String, batchId: Long): Unit =
    df.withColumn("src_batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("src_batch")
      .mode("overwrite")
      .parquet(dir)

  /** Seed the index directories with the standing corpus (partition
    * `src_batch=-1`) — run once before the stream starts; linear in the
    * corpus, the one-time cost every incremental scheme pays.
    */
  def seedIndex(corpus: DataFrame, indexDir: String,
                k: Int = 32, bands: Int = 8): Unit = {
    val s = sigs(corpus, k).persist()
    writePartition(bandsOf(s, k, bands), s"$indexDir/bands", -1L)
    writePartition(s.select(col("doc_id"), col("hs")), s"$indexDir/sets", -1L)
    s.unpersist()
  }

  /** One micro-batch: probe the index-so-far (excluding this batch id —
    * replay safety), verify candidates with exact Jaccard, write pairs,
    * append this batch's bands + sets to the index.
    */
  def processBatch(batch: Dataset[Row], batchId: Long,
                   indexDir: String, outDir: String,
                   k: Int = 32, bands: Int = 8,
                   threshold: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    val bs = sigs(batch.toDF(), k).persist()
    val bBands = bandsOf(bs, k, bands)
    val idxBands = spark.read.parquet(s"$indexDir/bands")
      .filter(col("src_batch") =!= batchId)
    val idxSets = spark.read.parquet(s"$indexDir/sets")
      .filter(col("src_batch") =!= batchId)
      .select(col("doc_id"), col("hs"))
    // candidates: this batch vs everything ingested before it, plus this
    // batch against itself — the "later batch emits the pair" invariant
    val vsIndex = bBands
      .join(idxBands.select(col("band"), col("band_key"),
        col("doc_id").as("doc_prior")), Seq("band", "band_key"))
      .select(least(col("doc_id"), col("doc_prior")).as("doc_a"),
        greatest(col("doc_id"), col("doc_prior")).as("doc_b"))
    val selfPairs = bBands.as("l")
      .join(bBands.as("r"), Seq("band", "band_key"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
    val candidates = vsIndex.unionByName(selfPairs)
      .dropDuplicates("doc_a", "doc_b")
    val sets = idxSets.unionByName(bs.select(col("doc_id"), col("hs")))
    val pairs = candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("h_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("h_b")), Seq("doc_b"))
      .filter(DedupOps.sizeCompatible(col("h_a"), col("h_b"), threshold))
      .withColumn("inter", expr("sorted_intersect_count(h_a, h_b)"))
      .withColumn("jaccard", round(
        col("inter").cast("double")
          / (size(col("h_a")) + size(col("h_b")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    writePartition(pairs, outDir, batchId)
    writePartition(bandsOf(bs, k, bands), s"$indexDir/bands", batchId)
    writePartition(bs.select(col("doc_id"), col("hs")), s"$indexDir/sets", batchId)
    bs.unpersist()
  }

  /** Wire a streaming `docs` source (doc_id, text) into the incremental
    * dedup loop. Seed the index from the corpus first.
    */
  def run(docs: DataFrame, indexDir: String, outDir: String,
          checkpoint: String, k: Int = 32, bands: Int = 8,
          threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, indexDir, outDir, k, bands, threshold)
      }
      .start()
}
