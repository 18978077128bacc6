package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** `cosine_sim(a, b)` over float/double arrays — one native pass computing
  * dot, |a|², |b|² together. The zip_with+aggregate formulation walks the
  * arrays three times through interpreted lambdas (HOFs have no codegen);
  * this is the hot kernel of brute-force kNN, LSH-ANN verification, and
  * embedding near-dup.
  *
  * The accumulation is a sequential left fold in DOUBLE, i = 0..n-1 — the
  * same order as `aggregate(zip_with(...))` and as a SQL `list_sum` fold, so
  * results are bit-identical to both.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private lazy val leftElem =
    left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  private lazy val rightElem =
    right.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(CosineSim.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftElem == FloatType, rightElem == FloatType))

  // codegen emits a direct static call (the loop itself is already compiled
  // Scala): no per-row virtual eval() dispatch, no Double boxing, and the
  // expression no longer breaks the surrounding WholeStageCodegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSim.compute($a, $b, " +
        s"${leftElem == FloatType}, ${rightElem == FloatType});")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** One pass over both arrays: dot, |a|², |b|² together, sequential left
    * fold in double (i = 0..n-1). Static so generated code can call it.
    */
  def compute(x: ArrayData, y: ArrayData, xIsFloat: Boolean, yIsFloat: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  def register(spark: SparkSession): Unit = RegisterOnce(spark, "cosine_sim") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "scala_udf")
  }
}

/** `dot_product(a, b)` — raw inner product of two numeric arrays as the same
  * sequential left fold (i = 0..n-1) in double as [[CosineSim]], minus the
  * normalization: the MIPS scoring kernel. Bit-identical to
  * `aggregate(zip_with(...))` and to a SQL `list_sum` over the ordered
  * products.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemOf(e: Expression) =
    e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  private lazy val leftElem = elemOf(left)
  private lazy val rightElem = elemOf(right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(DotProduct.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftElem == FloatType, rightElem == FloatType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.compute($a, $b, " +
        s"${leftElem == FloatType}, ${rightElem == FloatType});")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Strict sequential left fold of x_i·y_i, static for codegen. */
  def compute(x: ArrayData, y: ArrayData, xIsFloat: Boolean, yIsFloat: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  def register(spark: SparkSession): Unit = RegisterOnce(spark, "dot_product") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
  }
}

/** `sq_l2(a, b)` — squared L2 distance between two numeric arrays as a
  * strict sequential left fold (i = 0..n-1) in double: deterministic across
  * partitionings and bit-identical to a SQL `list_sum` over the same ordered
  * list, unlike a grouped SUM whose combine order floats. The kernel of the
  * centroid-assignment / IVF coarse-quantization paths.
  */
case class SqL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_l2"

  private def elemOf(e: Expression) =
    e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  private lazy val leftElem = elemOf(left)
  private lazy val rightElem = elemOf(right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(SqL2.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftElem == FloatType, rightElem == FloatType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SqL2.compute($a, $b, " +
        s"${leftElem == FloatType}, ${rightElem == FloatType});")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqL2 = copy(left = newLeft, right = newRight)
}

object SqL2 {
  /** Strict sequential left fold of (x_i − y_i)², static for codegen. */
  def compute(x: ArrayData, y: ArrayData, xIsFloat: Boolean, yIsFloat: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  def register(spark: SparkSession): Unit = RegisterOnce(spark, "sq_l2") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sq_l2", exprs => SqL2(exprs.head, exprs(1)), "scala_udf")
  }
}

/** All LSH table buckets of an embedding in ONE native pass. The HOF
  * formulation evaluates `aggregate(zip_with(...))` per hyperplane —
  * nTables×planesPerTable interpreted 64-element folds per row; this walks
  * the planes in a tight loop instead. Per plane the dot is the same
  * multiply-then-add left fold (i = 0..n-1) as the HOF form and the oracle's
  * `list_sum(list_transform(...))`, so bucket ids are bit-identical to both.
  *
  * `planes` is the deterministic ±1 hyperplane matrix (VectorOps
  * .hyperplanes); bucket bit j of table t is the sign of plane t·ppt+j.
  */
// stays CodegenFallback deliberately — see the measured CODEGEN NOTE in
// MinHash.scala (warm-identical, one-shot compile cost on the ANN queries)
case class LshBuckets(child: Expression, planes: Array[Array[Double]],
                      planesPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType,
      containsNull = false)
  override def prettyName: String = "lsh_buckets"

  private lazy val elem =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  override protected def nullSafeEval(embedding: Any): Any =
    LshBuckets.compute(embedding.asInstanceOf[ArrayData], planes, planesPerTable,
      elem == FloatType)

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  /** All table buckets in one pass; static for codegen. */
  def compute(e: ArrayData, planes: Array[Array[Double]], planesPerTable: Int,
              isFloat: Boolean): ArrayData = {
    val nTables = planes.length / planesPerTable
    val n = e.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) e.getFloat(i).toDouble else e.getDouble(i)
      i += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < planesPerTable) {
        val p = planes(t * planesPerTable + j)
        var dot = 0.0
        var d = 0
        val m = math.min(n, p.length)
        while (d < m) { dot += v(d) * p(d); d += 1 }
        if (dot > 0) bucket += (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Register `lsh_buckets(embedding) -> array<bigint>` bound to the given
    * plane matrix (the matrix is deterministic, so re-registration with the
    * same parameters is idempotent in effect).
    */
  def register(spark: SparkSession, planes: Array[Array[Double]],
               planesPerTable: Int): Unit =
    // the once-guard key carries a CONTENT hash of the plane matrix, not
    // just its shape: two same-shaped matrices from different RNG seeds
    // must not alias, or the second caller would silently compute buckets
    // with the first caller's stale planes (r16 advisor)
    RegisterOnce(spark,
      s"lsh_buckets:${planes.length}x${planes.headOption.fold(0)(_.length)}" +
        s":$planesPerTable:${planes.map(p => java.util.Arrays.hashCode(p)).toSeq.hashCode}") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "lsh_buckets", exprs => LshBuckets(exprs.head, planes, planesPerTable),
        "scala_udf")
    }
}
