package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSession

/** 64-bit SimHash over a token array — a native Catalyst expression (no Scala
  * UDF serialization overhead; evaluates directly on Tungsten `ArrayData`).
  *
  * Classic Charikar construction: each token contributes ±1 per output bit
  * according to its 64-bit hash; the signature bit is the sign of the sum.
  * Near-duplicate documents differ in few bits, so grouping by signature
  * bands gives O(n) near-dup candidate generation at corpus scale (the
  * scalable alternative to pairwise comparison).
  *
  * Token hashing reuses Spark's own XxHash64 kernel so the signature is
  * stable across JVMs and partitionings.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Register `simhash64(array<string>) -> bigint` for use via `expr(...)`
    * and SQL. Idempotent per session.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")

  /** Hamming distance between two signatures, as a column expression. */
  def hammingExpr(a: String, b: String): String =
    s"bit_count($a ^ $b)"
}
