package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hashes(text, L)` → array<long>: the Rabin–Karp polynomial hash
  * of EVERY length-L byte window of `text` (stride 1), computed with a true
  * rolling update — O(1) per window instead of the O(L) hash-of-substring
  * formulation, and no per-window string allocation at all. The kernel of
  * the exact duplicated-substring dedup pass, where a corpus-scale scan
  * emits |text| hashes per document and the per-window constant factor IS
  * the operator's cost.
  *
  * Hash: h(w) = Σ_{j<L} byte_j · B^{L-1-j}  (mod M), with B = 131 and
  * M = 2⁶¹−1 (Mersenne), so a SQL oracle replays any single window
  * independently as a 128-bit integer dot product with the precomputed
  * power ladder ([[RollingHash.powers]]) — no rolling state needed on the
  * replay side. Multiplication uses Math.multiplyHigh + Mersenne folding
  * (no BigInteger, no overflow).
  *
  * Positions are BYTE offsets; on ASCII corpora (the documented contract
  * of the whole text-hash family) they coincide with character offsets,
  * which is what keeps `substring`-based SQL oracles exact.
  *
  * Texts shorter than L yield an empty array.
  */
case class RollingHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override protected def nullSafeEval(s: Any, l: Any): Any =
    RollingHash.compute(s.asInstanceOf[UTF8String], l.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l) =>
      s"${ev.value} = graft.functions.RollingHash.compute($s, $l);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RollingHashes = copy(left = newLeft, right = newRight)
}

object RollingHash {
  val M: Long = (1L << 61) - 1
  val B: Long = 131L

  /** (a·b) mod M for a, b < 2⁶¹ — 128-bit product via multiplyHigh, then
    * Mersenne folding (2⁶⁴ ≡ 2³, 2⁶¹ ≡ 1 mod M).
    */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & M) + (lo >>> 61) + (hi << 3)
    r = (r & M) + (r >>> 61)
    if (r >= M) r - M else r
  }

  /** B^{L-1-j} mod M for j = 0..L-1 — the ladder a SQL replay dots each
    * window's bytes against. */
  def powers(l: Int): Array[Long] = {
    val out = new Array[Long](l)
    var p = 1L
    var j = l - 1
    while (j >= 0) { out(j) = p; p = mulmod(p, B); j -= 1 }
    out
  }

  /** All length-l window hashes of s, rolling: drop the leading byte's
    * B^{l-1} term, shift by B, add the entering byte. Static for codegen.
    */
  def compute(s: UTF8String, l: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < l) return new GenericArrayData(Array.emptyLongArray)
    val topPow = powers(l)(0) // B^{l-1} mod M
    val out = new Array[Long](n - l + 1)
    var h = 0L
    var i = 0
    while (i < l) { h = (mulmod(h, B) + (bytes(i) & 0xFF)) % M; i += 1 }
    out(0) = h
    while (i < n) {
      val drop = mulmod(bytes(i - l) & 0xFF, topPow)
      h = (mulmod(h - drop + M, B) + (bytes(i) & 0xFF)) % M
      out(i - l + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit = RegisterOnce(spark, "rolling_hashes") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hashes", exprs => RollingHashes(exprs.head, exprs(1)), "scala_udf")
  }
}
