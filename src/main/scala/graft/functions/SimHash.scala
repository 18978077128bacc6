package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.SparkSession

/** 61-bit SimHash over a token array — a native Catalyst expression (no Scala
  * UDF serialization overhead; evaluates directly on Tungsten `ArrayData`).
  *
  * Classic Charikar construction: each token contributes ±1 per output bit
  * according to its hash; the signature bit is the sign of the sum (a tied
  * sum yields 0). Near-duplicate documents differ in few bits, so grouping by
  * signature bands gives O(n) near-dup candidate generation at corpus scale
  * (the scalable alternative to pairwise comparison).
  *
  * Token hashing is the 61-bit masked `md5_number_lower` (see [[Md5Hash61]]),
  * so the signature is reproducible in any engine with MD5 — DuckDB computes
  * the identical value with `md5_number_lower` + bit arithmetic, giving this
  * operator an exact external oracle.
  */
// stays CodegenFallback deliberately — see the measured CODEGEN NOTE in
// MinHash.scala (warm-identical, one-shot compile cost on the dedup family)
case class SimHash61(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash61"

  override protected def nullSafeEval(tokens: Any): Any =
    java.lang.Long.valueOf(SimHash61.compute(tokens.asInstanceOf[ArrayData]))

  override protected def withNewChildInternal(newChild: Expression): SimHash61 =
    copy(child = newChild)
}

object SimHash61 {
  /** Cap on the per-thread token→hash memo (bounds executor memory; at the
    * cap the memo simply stops admitting new tokens, staying correct).
    */
  private[functions] val MaxCachedTokens = 1 << 16

  private[functions] val tokenCache: ThreadLocal[java.util.HashMap[String, java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, java.lang.Long](1 << 12))

  /** Charikar construction over the token array; static for codegen. */
  def compute(arr: ArrayData): Long = {
    val cache = tokenCache.get()
    val counts = new Array[Int](61)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // token frequencies are Zipfian: memoizing the per-token MD5 turns
        // the digest from per-occurrence into per-distinct-token cost
        val t = arr.getUTF8String(i).toString
        var boxed = cache.get(t)
        if (boxed == null) {
          boxed = java.lang.Long.valueOf(
            Md5Hash61.hash61(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          if (cache.size < MaxCachedTokens) cache.put(t, boxed)
        }
        val h = boxed.longValue()
        var b = 0
        while (b < 61) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 61) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Register `simhash61(array<string>) -> bigint` for use via `expr(...)`
    * and SQL. Idempotent per session.
    */
  def register(spark: SparkSession): Unit = RegisterOnce(spark, "simhash61") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash61", exprs => SimHash61(exprs.head), "scala_udf")
  }

  /** Hamming distance between two signatures, as a column expression. */
  def hammingExpr(a: String, b: String): String =
    s"bit_count($a ^ $b)"
}
