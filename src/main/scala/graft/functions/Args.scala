package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Shared argument extraction for `register`-time function builders.
  *
  * The sketch/hash aggregates take sizing parameters (k, dim, shingle
  * width) that must be FOLDABLE — they size per-partition buffers before
  * any row is seen. A bare `asInstanceOf[Literal].value.asInstanceOf[Int]`
  * turns a long literal (`misra_gries(key, 1024L)`), a non-literal k, or a
  * column reference into an opaque ClassCastException; this helper
  * pattern-matches the integral literal forms and raises an analysis-time
  * error that names the function and the offense instead.
  */
object Args {

  /** Extract a positive Int from an integral literal argument, or raise a
    * clear IllegalArgumentException naming `fn` and `argName`.
    */
  def posIntLiteral(e: Expression, fn: String, argName: String): Int = {
    val v: Long = e match {
      case Literal(v: Int, _) => v.toLong
      case Literal(v: Long, _) => v
      case Literal(v: Short, _) => v.toLong
      case Literal(v: Byte, _) => v.toLong
      case other if other.foldable =>
        other.eval() match {
          case i: java.lang.Integer => i.toLong
          case l: java.lang.Long => l.longValue()
          case s: java.lang.Short => s.toLong
          case b: java.lang.Byte => b.toLong
          case bad =>
            throw new IllegalArgumentException(
              s"$fn: argument '$argName' must be an integral literal, got " +
                s"foldable ${other.dataType.simpleString} expression " +
                s"(value: $bad)")
        }
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument '$argName' must be a literal integer, got " +
            s"non-foldable expression ${other.sql}")
    }
    if (v < 1 || v > Int.MaxValue)
      throw new IllegalArgumentException(
        s"$fn: argument '$argName' must be in [1, ${Int.MaxValue}], got $v")
    v.toInt
  }
}
