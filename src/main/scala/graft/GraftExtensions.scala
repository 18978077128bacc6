package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{MinHashSig, ShingleHashes, SimHash61}

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
  }
}
