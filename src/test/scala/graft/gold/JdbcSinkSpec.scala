package graft.gold

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Executes the JDBC gold path end-to-end against embedded Derby (in-memory,
  * ships with Spark, same JVM as the local executors — so the Spark JDBC
  * append actually writes through executor tasks). Proves the reference's
  * delete-then-append contract (`load_hicp_to_sql.py:54–101`): loading the
  * same series twice leaves the warehouse unchanged.
  */
class JdbcSinkSpec extends SparkSpec {

  import spark.implicits._

  // unique per-run DB name: an embedded in-memory Derby database lives for
  // the whole JVM, so a rerun in a warm sbt session must not see old rows
  private val url =
    s"jdbc:derby:memory:gold_${java.util.UUID.randomUUID.toString.replace("-", "")};create=true"
  private def conn() = DriverManager.getConnection(url)

  private lazy val rows = Seq(
    ("2024-01-01", "DE", "CP00", "I15", 105.1, "2024-02-01T00:00:00Z", "hicp_de.json"),
    ("2024-02-01", "DE", "CP00", "I15", 105.7, "2024-02-01T00:00:00Z", "hicp_de.json"),
    ("2024-01-01", "FR", "CP00", "I15", 103.2, "2024-02-01T00:00:00Z", "hicp_fr.json"))
    .toDF("time", "geo", "coicop", "unit", "value", "processed_at_utc", "raw_blob")
    .withColumn("time", to_date(col("time")))

  private val cfg = JdbcSink.JdbcConfig(url, "fact_hicp", "", "")

  private def count(where: String = ""): Long = {
    val c = conn()
    try {
      val rs = c.createStatement()
        .executeQuery(s"SELECT COUNT(*) FROM fact_hicp $where")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("ensureTable is idempotent and creates the gold schema") {
    val c = conn()
    try {
      JdbcSink.ensureTable(c)
      JdbcSink.ensureTable(c) // second call must be a no-op, not an error
      assert(JdbcSink.tableExists(c, "fact_hicp"))
    } finally c.close()
  }

  test("delete-then-append load is idempotent: replaying a series changes nothing") {
    JdbcSink.loadSeries(rows.filter(col("geo") === "DE"), cfg, "DE", "CP00", "I15")
    JdbcSink.loadSeries(rows.filter(col("geo") === "FR"), cfg, "FR", "CP00", "I15")
    assert(count() == 3)
    // replay the DE series: delete-then-append must leave counts unchanged
    JdbcSink.loadSeries(rows.filter(col("geo") === "DE"), cfg, "DE", "CP00", "I15")
    assert(count() == 3, "replaying a series load must not duplicate rows")
    assert(count("WHERE geo = 'DE'") == 2)
    // and the values are the replayed ones, not stale
    val c = conn()
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT value FROM fact_hicp WHERE geo = 'DE' AND time = DATE('2024-02-01')")
      assert(rs.next() && math.abs(rs.getDouble(1) - 105.7) < 1e-9)
    } finally c.close()
  }

  test("loadSeries honors a non-default table name end to end") {
    val cfg2 = JdbcSink.JdbcConfig(url, "fact_hicp_v2", "", "")
    JdbcSink.loadSeries(rows.filter(col("geo") === "DE"), cfg2, "DE", "CP00", "I15")
    val c = conn()
    try {
      assert(JdbcSink.tableExists(c, "fact_hicp_v2"))
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM fact_hicp_v2")
      rs.next()
      assert(rs.getLong(1) == 2)
    } finally c.close()
  }

  test("deleteSeries only touches the named series") {
    val c = conn()
    try {
      val n = JdbcSink.deleteSeries(c, "fact_hicp", "DE", "CP00", "I15")
      assert(n == 2, s"expected to delete the 2 DE rows, deleted $n")
      assert(count("WHERE geo = 'FR'") == 1)
    } finally c.close()
    // restore for any later assertions
    JdbcSink.loadSeries(rows.filter(col("geo") === "DE"), cfg, "DE", "CP00", "I15")
  }
}
