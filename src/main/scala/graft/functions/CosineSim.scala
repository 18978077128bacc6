package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def valueAt(arr: ArrayData, i: Int, elem: DataType): Double = elem match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  private lazy val leftElem =
    left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  private lazy val rightElem =
    right.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = valueAt(x, i, leftElem)
      val yv = valueAt(y, i, rightElem)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "scala_udf")
}
