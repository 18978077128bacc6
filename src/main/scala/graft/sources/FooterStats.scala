package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end storage-layout evidence: WRITE a date-bucketed parquet layout,
  * then read the REAL parquet footers back and compute data-skipping
  * decisions from them — no simulation anywhere in the loop.
  *
  * The `store_*` relational family models layout decisions (zone maps,
  * bloom skip, compaction) against in-query indexes; this operator closes
  * the loop with the physical format: the row counts, min/max envelopes and
  * skip verdicts it reports come from `ParquetFileReader` footer metadata
  * (row-group `Statistics`), never from scanning data pages. Footer parity
  * with the relational oracle proves two things at once — the writer laid
  * out exactly the buckets it claimed, and the committed column statistics
  * are trustworthy inputs for a query planner's pruning decision (this is
  * the file-footer half of what a table format's manifest stores; at
  * cluster scale the same stats ride in the Delta/Iceberg metadata layer
  * and this read becomes a metadata-table scan instead of a footer walk).
  *
  * Layout contract: one explicit 120-day date bucket per directory
  * (`bucket=K/`), rows routed with `repartition(bucket)` so every bucket is
  * written by exactly one task — deterministic placement the oracle can
  * replay, unlike range-partitioner sampling. The footer walk is
  * metadata-scale driver work (one footer per file, O(buckets) here);
  * reference for the blob-layout contract: `storage/blob.py:23–34`.
  */
object FooterStats {

  /** Bucket spans (days) and epoch anchor shared by writer, footer walk and
    * oracle. */
  val BucketDays = 120
  val Anchor = "1992-01-01"

  /** Write `orders`' date column bucketed to `outDir` and report per-bucket
    * footer statistics plus the skip verdict for the [lo, hi] date predicate.
    * Output (one row per bucket, footer-derived): bucket, n_rows, min_date,
    * max_date, skipped.
    */
  def dateBucketSkipStats(orders: DataFrame, outDir: String,
                          lo: String, hi: String): DataFrame = {
    val spark = orders.sparkSession
    orders
      // the source column has shipped as both DATE and timestamp[us];
      // normalize to DATE so the committed footer stats are INT32
      // days-since-epoch in every layout (UTC session, identity cast)
      .select(col("o_orderdate").cast("date").as("o_orderdate"),
        floor(datediff(col("o_orderdate"), lit(Anchor)) / BucketDays)
          .cast("int").as("bucket"))
      // one task per bucket -> one file per bucket directory; the write is
      // the only shuffle (narrow (date, int) rows)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir)

    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(outDir)
    val fs = root.getFileSystem(conf)
    val loDays = java.time.LocalDate.parse(lo).toEpochDay
    val hiDays = java.time.LocalDate.parse(hi).toEpochDay
    val rows = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map { dir =>
        val bucket = dir.getPath.getName.stripPrefix("bucket=").toInt
        var nRows = 0L
        var minDays = Long.MaxValue
        var maxDays = Long.MinValue
        fs.listStatus(dir.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            val reader = ParquetFileReader.open(
              HadoopInputFile.fromStatus(f, conf))
            try reader.getFooter.getBlocks.asScala.foreach { block =>
              nRows += block.getRowCount
              val cc = block.getColumns.asScala
                .find(_.getPath.toDotString == "o_orderdate")
                .getOrElse(sys.error(
                  s"footer of ${f.getPath} lacks o_orderdate stats"))
              val stats = cc.getStatistics
              require(stats != null && !stats.isEmpty,
                s"empty o_orderdate statistics in ${f.getPath} — " +
                  "footer-based skipping impossible; check writer config")
              // DATE is INT32 days-since-epoch in parquet
              minDays = math.min(minDays,
                stats.genericGetMin.asInstanceOf[Number].longValue())
              maxDays = math.max(maxDays,
                stats.genericGetMax.asInstanceOf[Number].longValue())
            }
            finally reader.close()
          }
        Row(bucket, nRows,
          java.time.LocalDate.ofEpochDay(minDays).toString,
          java.time.LocalDate.ofEpochDay(maxDays).toString,
          maxDays < loDays || minDays > hiDays)
      }
    val schema = StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("min_date", StringType, nullable = false),
      StructField("max_date", StringType, nullable = false),
      StructField("skipped", BooleanType, nullable = false)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .orderBy(col("bucket"))
  }
}
