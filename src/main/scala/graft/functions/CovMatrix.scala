package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `cov_matrix(embedding, dim)` — the full dim×dim POPULATION covariance
  * matrix of a vector column in ONE pass, as a native imperative aggregate:
  * the buffer is a flat `Array[Double]` of [n | per-dimension sums |
  * upper-triangle product sums] (1 + d + d(d+1)/2 slots), `update` folds a
  * row's outer product into it, `merge` is element-wise addition — so the
  * aggregate partial-aggregates map-side and the exchange carries ONE
  * ~33 KB buffer per partition instead of per-row outer products. This is
  * the input of PCA/whitening over an embedding corpus; the explode-and-
  * self-join formulation shuffles |corpus|·d(d+1)/2 rows (205M at sf1) and
  * is exactly what this expression exists to avoid.
  *
  * An imperative buffer (TypedImperativeAggregate) rather than GeoMean's
  * declarative expression tree: 2,080 buffer slots as individual codegen
  * expressions would blow past the JIT method limit; one JVM array walk is
  * the right tool at this width.
  *
  * Output: array<struct<i, j, cov>> for i ≤ j, population covariance
  * P_ij/n − (S_i/n)(S_j/n). Null/short vectors are skipped; an empty group
  * yields an empty array. Callers quantize (combine order floats the last
  * ulp, like every distributed sum).
  */
case class CovMatrix(child: Expression, dim: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  private val nSums = dim
  private val nProds = dim * (dim + 1) / 2

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("cov", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cov_matrix"

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](1 + nSums + nProds)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return buf
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf(0) += 1.0
    i = 0
    var k = 1 + nSums
    while (i < dim) {
      buf(1 + i) += x(i)
      var j = i
      while (j < dim) {
        buf(k) += x(i) * x(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    val n = buf(0)
    if (n == 0.0) return new GenericArrayData(Array.empty[Any])
    val rows = new Array[Any](nProds)
    var i = 0
    var k = 1 + nSums
    var out = 0
    while (i < dim) {
      val mi = buf(1 + i) / n
      var j = i
      while (j < dim) {
        val mj = buf(1 + j) / n
        rows(out) = InternalRow(i, j, buf(k) / n - mi * mj)
        out += 1; k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(off: Int): CovMatrix =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CovMatrix =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): CovMatrix =
    copy(child = newChild)
}

object CovMatrix {
  /** Register `cov_matrix(arr, dimLiteral)` for `expr(...)` use. */
  def register(spark: SparkSession): Unit = RegisterOnce(spark, "cov_matrix") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cov_matrix",
      exprs => CovMatrix(exprs.head,
        Args.posIntLiteral(exprs(1), "cov_matrix", "dim"))
        .toAggregateExpression(),
      "scala_udf")
  }
}
