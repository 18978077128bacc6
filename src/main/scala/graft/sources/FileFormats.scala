package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange file formats beyond Parquet — the ingest/export edges of a
  * pipeline (reference pulls JSON REST payloads and ships tabular extracts;
  * cf. `/root/reference` src/ingestion/ingestion_hicp_raw.py:60-76 writing
  * raw JSON artifacts). Contracts that matter at scale:
  *
  *   - reads take an EXPLICIT schema, never `inferSchema` — inference is a
  *     second full pass over the input and can silently flip a column's
  *     type between batches (a 100-TB ingest cannot re-scan to guess);
  *   - CSV is written quoted+escaped so delimiters/newlines in free text
  *     survive the round trip, and read in `FAILFAST` mode — a malformed
  *     row is a loud error, not a silent null row (`PERMISSIVE` belongs in
  *     quarantine flows that keep `columnNameOfCorruptRecord`);
  *   - ORC round-trips the full Catalyst type lattice (arrays, decimals,
  *     timestamps) and supports predicate pushdown + column pruning like
  *     Parquet — the drop-in choice when the lake standard is ORC.
  */
object FileFormats {

  /** Headered, quoted CSV export. One directory of part files — writers
    * stay parallel; `coalesce(1)` here would serialize the export through
    * one task at scale.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")          // RFC 4180 double-quote escaping
      // Hive-style null sentinel: Spark's CSV READER folds an unquoted
      // empty field AND a quoted "" both to null under the default
      // nullValue="", so null vs empty-string survives the round trip only
      // with a distinct sentinel. (A real "\N" text value would read back
      // as null — the standard, documented trade-off of the convention.)
      .option("nullValue", "\\N")
      .csv(path)

  /** Schema-explicit CSV read, FAILFAST. Mirrors [[writeCsv]]'s `\N` null
    * sentinel, so empty string and null stay distinct.
    *
    * `multiLine` parses quoted embedded newlines correctly but makes each
    * file NON-SPLITTABLE (one task per file) — leave it off unless the
    * data truly contains them, and keep files small when it is on.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      .option("multiLine", multiLine)
      .option("mode", "FAILFAST")
      .csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Schema-explicit ORC read — the schema argument also acts as a
    * projection contract (missing columns fail loudly at analysis).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** JSON Lines export — one JSON object per line, the splittable layout
    * (whole-file JSON documents like the reference's raw blob wrappers are
    * a SINGLE task per file on read; line-delimited keeps every format
    * advantage while staying parallel). `ignoreNullFields=false` writes
    * explicit nulls so null vs absent-key survives the round trip — the
    * JSON analogue of CSV's `\N` sentinel.
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("ignoreNullFields", "false")
      .json(path)

  /** Schema-explicit JSON Lines read, FAILFAST: a row that does not parse
    * or a value that does not fit the declared type is a loud error — the
    * PERMISSIVE default would silently null the whole row. Nested structs
    * and arrays in the schema are honored (JSON's native strength over
    * CSV); with `multiLine=true` one whole-document JSON file can be read,
    * at the documented cost of non-splittable single-task files.
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType,
                    multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("multiLine", multiLine)
      .option("mode", "FAILFAST")
      .json(path)
}
