package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BandHashes, CosineSim, DotProduct, Hash61, IntersectCount, MinHashSig, ShingleHashes, SimHash61, SqL2}

/** Standard Spark extension entry point: registers the engine's native
  * Catalyst functions permanently for a session, so any user (including pure
  * SQL) gets them via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`. The
  * per-session `*.register(spark)` helpers remain for ad-hoc use; this is the
  * cluster-deployment path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.rules.JaccardPrefilter)
    e.injectFunction((
      FunctionIdentifier("simhash61"),
      info("simhash61", "simhash61(tokens) - 61-bit MD5-based SimHash of a token array"),
      exprs => SimHash61(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(tokens[, n]) - distinct n-gram shingle hashes"),
      exprs => ShingleHashes(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(3))))
    e.injectFunction((
      FunctionIdentifier("shingle_hash_seq"),
      info("shingle_hash_seq", "shingle_hash_seq(tokens[, n]) - ordered rolling shingle hashes"),
      exprs => ShingleHashes(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(3), distinct = false)))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashes[, k]) - k salted min-hashes"),
      exprs => MinHashSig(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(32))))
    e.injectFunction((
      FunctionIdentifier("band_hashes"),
      info("band_hashes", "band_hashes(sig[, bands[, rows_per_band]]) - 61-bit LSH band keys"),
      exprs => BandHashes(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(8),
        exprs.lift(2).map(_.eval().asInstanceOf[Int]).getOrElse(4))))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |a ∩ b| of two sorted long arrays"),
      exprs => IntersectCount(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("hash61"),
      info("hash61", "hash61(s) - 61-bit MD5 key of one string"),
      exprs => Hash61(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - single-pass cosine similarity"),
      exprs => CosineSim(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - inner product, sequential fold"),
      exprs => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("sq_l2"),
      info("sq_l2", "sq_l2(a, b) - squared L2 distance, sequential fold"),
      exprs => SqL2(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("rolling_hashes"),
      info("rolling_hashes",
        "rolling_hashes(text, L) - Rabin-Karp hash of every length-L byte window"),
      exprs => graft.functions.RollingHashes(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("geomean"),
      info("geomean", "geomean(x) - geometric mean (declarative aggregate)"),
      exprs => graft.functions.GeoMean(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("cov_matrix"),
      info("cov_matrix",
        "cov_matrix(vec, dim) - one-pass population covariance matrix aggregate"),
      exprs => graft.functions.CovMatrix(exprs.head,
        graft.functions.Args.posIntLiteral(exprs(1), "cov_matrix", "dim"))
        .toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("hdr_sketch"),
      info("hdr_sketch",
        "hdr_sketch(value) - mergeable log-linear quantile sketch aggregate"),
      exprs => graft.functions.HdrSketch.fromExprs(exprs)))
    e.injectFunction((
      FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "misra_gries(key, k) - bounded-memory heavy-hitter summary aggregate"),
      exprs => graft.functions.MisraGries.fromExprs(exprs)))
  }
}
