package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SimHash64

/** Deduplication operator family over `documents` (LLM-pipeline extension):
  *
  *   - exact:   hash-groupBy on a content fingerprint — one shuffle on the
  *              16-byte digest, survivor = min(doc_id);
  *   - n-gram Jaccard: exact pairwise similarity, *blocked* so the quadratic
  *              blow-up is bounded per block (lang × n_chars bucket here; at
  *              100 TB the block key IS the partitioner, so each block joins
  *              locally);
  *   - MinHash+LSH: the scale path — constant-size signature per doc, banded
  *              bucketing turns pairwise search into an equi-join on band
  *              hash, candidates verified with exact Jaccard;
  *   - SimHash: 64-bit signature (custom Catalyst expression), near-dups
  *              found by grouping on signature bands / hamming radius.
  */
object DedupOps {

  /** 3-token shingle set (distinct) of the normalized text. Empty when the
    * document has fewer than `n` tokens.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    val sh = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(
      when(size(toks) < n, array().cast("array<string>")).otherwise(sh))
  }

  /** Exact dedup stats: duplicate groups by fingerprint + rows beyond first +
    * survivor count (keep-first = min doc_id).
    */
  def exactDupStats(docs: DataFrame): DataFrame = {
    val byFp = docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("survivor"))
    byFp.agg(
      count(lit(1)).as("n_distinct_texts"),
      count(when(col("n") > 1, 1)).as("n_dup_groups"),
      coalesce(sum(when(col("n") > 1, col("n") - 1)), lit(0L)).as("n_dup_rows"))
  }

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Exact n-gram Jaccard near-dup pairs within (lang, n_chars bucket)
    * blocks. Blocking bounds the pairwise comparison to each block and maps
    * directly to a co-partitioned self-join at scale.
    */
  def ngramJaccardPairs(docs: DataFrame, bucketWidth: Int = 16,
                        threshold: Double = 0.5): DataFrame = {
    val base = docs
      .withColumn("sh", shingles(col("text")))
      .filter(size(col("sh")) > 0)
      .withColumn("bucket", (col("n_chars") / bucketWidth).cast("long"))
      .select(col("doc_id"), col("lang"), col("bucket"), col("sh"))
    val a = base.select(col("doc_id").as("doc_a"), col("lang"), col("bucket"), col("sh").as("sh_a"))
    val b = base.select(col("doc_id").as("doc_b"), col("lang"), col("bucket"), col("sh").as("sh_b"))
    a.join(b, Seq("lang", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("lang"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash signature: K independent min-hashes of the shingle set (salted
    * xxhash64). Constant size per document regardless of length.
    */
  def minhashSignature(shingleCol: String, k: Int = 32): Column =
    array((0 until k).map(seed =>
      expr(s"array_min(transform($shingleCol, s -> xxhash64($seed, s)))")): _*)

  /** MinHash-LSH near-dup pairs: signatures → bands (rows-per-band hashes) →
    * equi-join on (band index, band hash) → distinct candidate pairs →
    * verified with exact Jaccard. The only shuffles are the band-bucket
    * exchange (O(n·bands)) and the candidate join — never O(n²).
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 32, bands: Int = 8,
                      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = k / bands
    val withSig = docs
      .withColumn("sh", shingles(col("text")))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature("sh", k))
    val banded = withSig.select(
      col("doc_id"), col("sh"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band", "band_hash")))
    val l = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash signatures + banded candidates: docs sharing any 16-bit band of
    * the 64-bit signature are candidates; report pairs within the given
    * hamming radius.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    SimHash64.register(docs.sparkSession)
    val sigs = docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sig", expr("simhash64(toks)"))
      .select(col("doc_id"), col("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> (shiftright(sig, b * 16) & 65535))"))
        .as(Seq("band", "band_bits")))
    val l = banded.select(col("band"), col("band_bits"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("band_bits"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "band_bits"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr(SimHash64.hammingExpr("sig_a", "sig_b")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
