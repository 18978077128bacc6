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
  /** `events.ts` is INT64 TIMESTAMP(NANOS) in parquet, which Spark 4 refuses
    * to read as a timestamp. Read it as a raw ns long (legacy conf), then
    * expose BOTH a µs-precision `ts` timestamp (for window/date functions)
    * and the exact `ts_ns` long (for sub-µs arithmetic like session gaps, and
    * for bit-exact parity with engines that keep ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts_ns div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
