package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Once-per-session guard for temp-function registration.
  *
  * Every operator entry point calls `X.register(spark)` defensively, so a
  * 331-query bench session re-registered each function hundreds of times:
  * harmless semantically (`createOrReplaceTempFunction` is a map put and
  * every registration binds identical builders), but each replace logs a
  * WARN through the SLF4J console appender — thousands of synchronized
  * stderr writes per full-registry run, pure overhead on the shared-JVM
  * path (r15 verdict item 4). The guard keys on the live
  * `FunctionRegistry` instance (weakly, so dropped sessions unpin), and on
  * a caller key that must encode any registration PARAMETERS (e.g.
  * `lsh_buckets` binds a plane matrix — different dims must re-register).
  */
object RegisterOnce {
  private val done = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, java.util.Set[String]]())

  def apply(spark: SparkSession, key: String)(body: => Unit): Unit = {
    val reg = spark.sessionState.functionRegistry
    val set = done.synchronized {
      done.computeIfAbsent(reg, _ => ConcurrentHashMap.newKeySet[String]())
    }
    if (set.add(key)) body
  }
}
