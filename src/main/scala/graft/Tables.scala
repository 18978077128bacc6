package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * Reads go through `spark.read.parquet` so Catalyst's vectorized parquet
  * reader, predicate pushdown and column pruning all apply; at cluster scale
  * the same call reads a partitioned directory tree instead of one file.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** Events adapter: downstream operators consume BOTH a timestamp `ts` (for
    * window/date functions) and an exact ns-epoch long `ts_ns` (for integer
    * session-gap arithmetic and tie-free ordering). The parquet layout has
    * shipped in two variants, so detect which one arrived:
    *
    *  - `ts` as INT64 TIMESTAMP(NANOS) (legacy): Spark 4 refuses to read it as
    *    a timestamp, so read it as a raw ns long (legacy conf), keep it as
    *    `ts_ns`, and rebuild a µs-truncated `ts`.
    *  - `ts` as plain timestamp[us] (current): keep `ts` (cast NTZ→LTZ, an
    *    identity under the UTC session timezone every entrypoint sets) and
    *    derive `ts_ns = unix_micros(ts) * 1000` — still exact, since the data
    *    has no sub-µs precision.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val adapted = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
    }
    // Both branches expose the same positional layout, so consumers that
    // select by index or union-by-position behave identically either way.
    adapted.select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
