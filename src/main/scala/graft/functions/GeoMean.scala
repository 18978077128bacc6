package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Cast,
  Divide, EqualTo, Exp, Expression, GreaterThan, If, IsNull, Literal, Log, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `geomean(x)` — geometric mean as a native DECLARATIVE aggregate: the
  * buffer is (Σ ln x, n), update/merge/evaluate are plain expression trees,
  * so the whole aggregate lives inside whole-stage codegen and gets
  * map-side partial aggregation for free — the property an `Aggregator` /
  * UDAF (opaque JVM functions to Catalyst) never gets. Geometric means are
  * the right mean for ratio-scale quality metrics (per-doc quality scores,
  * compression ratios, speedups) where one outlier must not dominate, and
  * the log-space buffer is overflow-proof where a product would not be.
  *
  * Null and non-positive inputs are ignored (the aggregate is defined over
  * the positive reals); an all-ignored group evaluates to null, matching
  * SQL aggregate convention.
  */
case class GeoMean(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "geomean"

  private lazy val logSum = AttributeReference("logSum", DoubleType)()
  private lazy val n = AttributeReference("n", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(logSum, n)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0L))

  private def skip: Expression =
    Or(IsNull(child), Not(GreaterThan(Cast(child, DoubleType), Literal(0.0))))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(skip, logSum, Add(logSum, Log(Cast(child, DoubleType)))),
    If(skip, n, Add(n, Literal(1L))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(logSum.left, logSum.right),
    Add(n.left, n.right))

  override lazy val evaluateExpression: Expression =
    If(EqualTo(n, Literal(0L)), Literal(null, DoubleType),
      Exp(Divide(logSum, Cast(n, DoubleType))))

  override protected def withNewChildInternal(newChild: Expression): GeoMean =
    copy(child = newChild)
}

object GeoMean {
  /** Register `geomean(x)` for `expr(...)` use. Idempotent per session. */
  def register(spark: SparkSession): Unit = RegisterOnce(spark, "geomean") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geomean",
      exprs => GeoMean(exprs.head).toAggregateExpression(),
      "scala_udf")
  }
}
