package graft.gold

import java.sql.Connection

import org.apache.spark.sql.DataFrame

/** JDBC warehouse sink (SURVEY.md §2.1 SRC6, §2.4 G4/G5): the standard
  * Spark JDBC write path with the reference's batching behavior
  * (`db/sql.py:10–40`, `load_hicp_to_sql.py:88–101`). No database ships in
  * this harness, so these stay exercised only at the API level; the parquet
  * partition-overwrite path in `GoldWriter` is the tested default sink.
  */
object JdbcSink {

  final case class JdbcConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      batchSize: Int = 200, // reference chunksize (`load_hicp_to_sql.py:99`)
      isolationLevel: String = "READ_COMMITTED")

  /** Gold DDL mirroring `ensure_table` (`load_hicp_to_sql.py:32–51`). */
  val EnsureTableDdl: String =
    """CREATE TABLE IF NOT EXISTS fact_hicp (
      |  time DATE NOT NULL,
      |  geo VARCHAR(10) NOT NULL,
      |  coicop VARCHAR(20) NOT NULL,
      |  unit VARCHAR(20) NOT NULL,
      |  value DOUBLE PRECISION NULL,
      |  processed_at_utc VARCHAR(40) NOT NULL,
      |  raw_blob VARCHAR(300) NOT NULL,
      |  CONSTRAINT ux_fact_hicp UNIQUE (time, geo, coicop, unit))""".stripMargin

  /** G4: idempotent DDL through a plain driver-side connection. */
  def ensureTable(conn: Connection): Unit = {
    val st = conn.createStatement()
    try st.execute(EnsureTableDdl) finally st.close()
  }

  /** G5 first half: driver-side DELETE of the series about to be loaded
    * (`delete_existing_series`, `load_hicp_to_sql.py:54–62`).
    */
  def deleteSeries(conn: Connection, table: String,
                   geo: String, coicop: String, unit: String): Int = {
    val ps = conn.prepareStatement(
      s"DELETE FROM $table WHERE geo = ? AND coicop = ? AND unit = ?")
    try {
      ps.setString(1, geo); ps.setString(2, coicop); ps.setString(3, unit)
      ps.executeUpdate()
    } finally ps.close()
  }

  /** G5 second half: batched executor-parallel append — each task opens its
    * own connection and writes `batchSize`-row batches (the Spark analogue of
    * chunked multi-VALUES + fast_executemany).
    */
  def append(df: DataFrame, cfg: JdbcConfig): Unit =
    df.write
      .format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", cfg.batchSize)
      .option("isolationLevel", cfg.isolationLevel)
      .mode("append")
      .save()
}
