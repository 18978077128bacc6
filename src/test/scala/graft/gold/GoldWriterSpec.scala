package graft.gold

import java.nio.file.Files
import graft.SparkSpec
import graft.quality.QualityChecks.{CheckResult, Report}

class GoldWriterSpec extends SparkSpec {

  import spark.implicits._

  private def series(geo: String, vs: Double*) =
    vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(f"2024-${i + 1}%02d-01"), geo, "CP00", "I15", v)
    }

  test("G5: dynamic partition overwrite replaces only the written series") {
    val dir = Files.createTempDirectory("gold").toString
    val cols = Seq("time", "geo", "coicop", "unit", "value")
    GoldWriter.writeGold(
      (series("LU", 1, 2) ++ series("DE", 3, 4)).toDF(cols: _*), dir,
      Seq("geo", "coicop", "unit"))
    // rewrite LU only, with new values; DE must stay intact
    GoldWriter.writeGold(series("LU", 9, 9).toDF(cols: _*), dir,
      Seq("geo", "coicop", "unit"))
    val out = spark.read.parquet(dir)
    val byGeo = out.collect().groupBy(_.getAs[String]("geo"))
    assert(byGeo("LU").map(_.getAs[Double]("value")).sorted.toSeq == Seq(9.0, 9.0))
    assert(byGeo("DE").map(_.getAs[Double]("value")).sorted.toSeq == Seq(3.0, 4.0))
  }

  test("Q8+G1: PASS report opens the gate; FAIL report blocks it") {
    val dir = Files.createTempDirectory("reports").toString
    val pass = Report(passed = true, Seq(CheckResult("x", passed = true, Map())), Map("rows" -> "4"))
    val p = GoldWriter.writeReport(spark, dir, pass, "20260101_000000", "processed/a.parquet")
    assert(p.contains("_PASS"))
    assert(GoldWriter.requirePass(spark, dir) == p)

    val fail = Report(passed = false, Seq(CheckResult("x", passed = false, Map("k" -> "v"))), Map())
    GoldWriter.writeReport(spark, dir, fail, "20260102_000000", "processed/b.parquet")
    intercept[IllegalStateException] { GoldWriter.requirePass(spark, dir) }
  }

  test("SRC5: latestPath resolves the most recently modified object") {
    val dir = Files.createTempDirectory("blobs").toString
    val f1 = new java.io.File(dir, "ts=20260101.json")
    val f2 = new java.io.File(dir, "ts=20260102.json")
    Files.writeString(f1.toPath, "a"); Files.writeString(f2.toPath, "b")
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    assert(GoldWriter.latestPath(spark, dir, ".json").exists(_.endsWith("ts=20260102.json")))
    assert(GoldWriter.latestPath(spark, dir + "/nope").isEmpty)
  }
}
