package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expressions for the MinHash pipeline. The pure
  * higher-order-function formulation (transform/array_min lambdas) is
  * interpreted per element — ~8k boxed lambda invocations per document for
  * k=32 over ~250 shingles. These expressions run the same arithmetic as a
  * tight JVM loop over Tungsten `ArrayData` (no boxing, one pass), which
  * measured ~10x faster end-to-end on the LSH query.
  *
  * HASH CHOICE — cross-engine reproducibility. The base shingle hash is the
  * lower 64 bits of MD5 (exactly DuckDB's `md5_number_lower`: the digest's
  * last 8 bytes, little-endian) masked to 61 bits, and the k MinHash values
  * derive from it by fixed affine permutations modulo the Mersenne prime
  * 2^61-1. Every step is therefore expressible in portable SQL (hugeint
  * arithmetic + md5_number_lower in DuckDB), so the LSH/SimHash/winnowing
  * operators get EXACT external oracles instead of rows-only checks, and the
  * signatures are stable across engines, JVMs, and partitionings. MD5 runs
  * once per shingle (the k permutations are 6 ALU ops each), so the cost
  * over xxhash is one short digest per shingle — negligible against the
  * join work downstream.
  */
object Md5Hash61 {
  /** 2^61 - 1, the modulus of the permutation domain. */
  val M: Long = 2305843009213693951L

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def digestFor(): MessageDigest = { val d = mdLocal.get(); d.reset(); d }

  /** Lower-64 of an MD5 digest per DuckDB `md5_number_lower`: last 8 digest
    * bytes, little-endian — then masked into the 61-bit domain.
    */
  def finish61(md: MessageDigest): Long = {
    val d = md.digest()
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h & M
  }

  def hash61(bytes: Array[Byte]): Long = {
    val md = digestFor()
    md.update(bytes)
    finish61(md)
  }

  /** Fixed affine-permutation constants (a_s, b_s) in [0, M): golden-ratio
    * multiples masked into the domain. The SAME table generates both the JVM
    * evaluation and the DuckDB oracle SQL, so the two engines compute
    * identical signatures by construction.
    */
  val AB: Array[(Long, Long)] = Array.tabulate(64) { s =>
    val a = (0x9E3779B97F4A7C15L * (2 * s + 3)) & M
    val b = (0xC2B2AE3D27D4EB4FL * (s + 1)) & M
    (if (a == 0) 1L else a, b)
  }

  /** Multiplier for folding a band's signature rows into one 61-bit key
    * (`band_hashes`): acc ← (BandA·acc + v) mod M. Both engines compute the
    * identical fold, so the (negligible) collisions are identical too.
    */
  val BandA: Long = 0x9E3779B97F4A7C15L & M

  /** (a*h + b) mod M, exact, for 0 <= a,h <= M < 2^61. The 122-bit product
    * folds via 2^64 ≡ 8 and 2^61 ≡ 1 (mod M) — no BigInt, ~6 ALU ops.
    */
  def mulAddMod(a: Long, h: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, h) // operands < 2^61 ⇒ positive, exact
    val lo = a * h                   // wrapped low 64 bits
    var r = (hi << 3) + (lo >>> 61) + (lo & M)
    while (r >= M) r -= M
    r += b
    if (r >= M) r -= M
    r
  }
}

/** `shingle_hashes(tokens[, n])` → distinct 61-bit MD5 hashes of all n-gram
  * shingle strings (tokens joined by a single space) of the token array,
  * SORTED ascending (so set intersections downstream can merge-walk instead
  * of building per-row hash sets — see [[IntersectCount]]);
  * `shingle_hash_seq` is the positionally-ordered non-distinct variant
  * (winnowing input). Hash-identical to DuckDB's
  * `md5_number_lower(array_to_string(toks[i:i+n-1], ' ')) & (2^61-1)`.
  */
/* CODEGEN NOTE (measured, r3): the array-kernel expressions below
 * (ShingleHashes, MinHashSig, BandHashes — and SimHash61/LshBuckets in
 * their files) deliberately stay CodegenFallback. A doGenCode variant
 * (static call, same shape as CosineSim.compute) measured IDENTICAL warm
 * throughput at sf0.1 — their cost is the MD5/array loop itself, not eval()
 * dispatch — while the extra generated-class compilation added ~1-2 s of
 * one-shot latency to the dedup queries. The scalar per-pair kernels
 * (CosineSim, SqL2, IntersectCount) keep codegen: they sit inside hot
 * join filters where staying in the WholeStageCodegen span does win.
 */
/** `hash61(string)` → the 61-bit MD5 key of ONE string: the scalar twin of
  * the array kernels, for paths that recover a string by its hash (DuckDB:
  * `md5_number_lower(s) & (2^61-1)`).
  */
case class Hash61(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "hash61"

  override protected def nullSafeEval(s: Any): Any =
    Md5Hash61.hash61(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): Hash61 =
    copy(child = newChild)
}

case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (distinct) "shingle_hashes" else "shingle_hash_seq"

  override protected def nullSafeEval(tokens: Any): Any =
    ShingleHashes.compute(tokens.asInstanceOf[ArrayData], n, distinct)

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val space = Array(' '.toByte)

  /** Static so generated code can call it directly. */
  def compute(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    // each token participates in up to n shingles — extract its bytes once
    val tb = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) {
      tb(t) = if (arr.isNullAt(t)) Array.emptyByteArray else arr.getUTF8String(t).getBytes
      t += 1
    }
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    val seq = if (distinct) null else new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val md = Md5Hash61.digestFor()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(space)
        md.update(tb(i + j))
        j += 1
      }
      val h = Md5Hash61.finish61(md)
      if (distinct) seen.add(h) else seq(i) = h
      i += 1
    }
    if (!distinct) return new GenericArrayData(seq)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    java.util.Arrays.sort(out) // all values ≥ 0: signed sort == unsigned sort
    new GenericArrayData(out)
  }
}

/** `minhash_sig(hashes[, k])` → k affine-permutation min-hashes of a long
  * array: one pass over the elements, k permutations each (6 ALU ops).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k <= Md5Hash61.AB.length, s"k=$k exceeds permutation table")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(hashes: Any): Any =
    MinHashSig.compute(hashes.asInstanceOf[ArrayData], k)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** One pass over the hashes, k affine permutations each; static for
    * codegen.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val m = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = arr.getLong(i)
      var s = 0
      while (s < k) {
        val (a, b) = Md5Hash61.AB(s)
        val v = Md5Hash61.mulAddMod(a, h, b)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `band_hashes(sig[, bands[, rows_per_band]])` → one 61-bit key per LSH
  * band: the affine fold acc ← (BandA·acc + sig_i) mod 2^61-1 over the band's
  * rows. A single long per band keeps the band shuffle key narrow (the raw
  * 4-long slice as a join key forces wide array comparisons), and the fold is
  * replayed verbatim by the DuckDB oracle, so both engines see identical
  * buckets — including any of the ~2^-61-rare fold collisions, which the
  * exact-Jaccard verification step absorbs anyway.
  */
case class BandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"

  override protected def nullSafeEval(sig: Any): Any =
    BandHashes.compute(sig.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

object BandHashes {
  /** Affine fold per band; static for codegen. */
  def compute(arr: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var j = 0
      while (j < rowsPerBand) {
        acc = Md5Hash61.mulAddMod(Md5Hash61.BandA, acc, arr.getLong(b * rowsPerBand + j))
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `sorted_intersect_count(a, b)` → |a ∩ b| for two SORTED distinct long
  * arrays, via a single merge walk — no per-row hash set, no boxing. This is
  * the hot inner loop of every pairwise Jaccard verification (blocked n-gram
  * dedup, LSH candidate verification): per pair cost is O(|a|+|b|) loads and
  * compares, ~5-10x cheaper than `array_intersect`'s generic set build.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Integer.valueOf(IntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  // direct static call from generated code: the merge walk stays compiled
  // Scala, but the per-pair virtual eval() + boxing disappear and the
  // verification filter stays inside WholeStageCodegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntersectCount = copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Merge walk over two SORTED long arrays; static for codegen. */
  def compute(x: ArrayData, y: ArrayData): Int = {
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val vx = x.getLong(i)
      val vy = y.getLong(j)
      if (vx == vy) { c += 1; i += 1; j += 1 }
      else if (vx < vy) i += 1
      else j += 1
    }
    c
  }
}

object MinHashFunctions {
  /** Register `shingle_hashes(tokens[, n])` and `minhash_sig(hashes[, k])`
    * for use via `expr(...)`. Idempotent per session.
    */
  def register(spark: SparkSession): Unit = RegisterOnce(spark, "minhash_family") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashes(exprs.head,
        exprs.lift(1).map(Args.posIntLiteral(_, "shingle_hashes", "n")).getOrElse(3)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hash_seq",
      exprs => ShingleHashes(exprs.head,
        exprs.lift(1).map(Args.posIntLiteral(_, "shingle_hash_seq", "n"))
          .getOrElse(3), distinct = false),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs.head,
        exprs.lift(1).map(Args.posIntLiteral(_, "minhash_sig", "k")).getOrElse(32)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => IntersectCount(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "band_hashes",
      exprs => BandHashes(exprs.head,
        exprs.lift(1).map(Args.posIntLiteral(_, "band_hashes", "bands")).getOrElse(8),
        exprs.lift(2).map(Args.posIntLiteral(_, "band_hashes", "rowsPerBand"))
          .getOrElse(4)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash61", exprs => Hash61(exprs.head), "scala_udf")
  }
}
