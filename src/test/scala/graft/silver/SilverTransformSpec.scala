package graft.silver

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SilverTransformSpec extends SparkSpec {

  import spark.implicits._

  private def parse(codes: String*): Seq[Option[Timestamp]] =
    codes.toDF("t").select(SilverTransform.parseTimeCode(col("t")).as("p"))
      .collect().map(r => Option(r.getTimestamp(0))).toSeq

  test("S3: Eurostat monthly codes parse to month start") {
    assert(parse("2024M01") == Seq(Some(Timestamp.valueOf("2024-01-01 00:00:00"))))
    assert(parse("1999M12") == Seq(Some(Timestamp.valueOf("1999-12-01 00:00:00"))))
  }

  test("S3: ISO forms normalize to month start; junk coerces to null") {
    assert(parse("2024-03-15") == Seq(Some(Timestamp.valueOf("2024-03-01 00:00:00"))))
    assert(parse("2024-03") == Seq(Some(Timestamp.valueOf("2024-03-01 00:00:00"))))
    assert(parse("2024") == Seq(Some(Timestamp.valueOf("2024-01-01 00:00:00"))))
    assert(parse("not-a-date") == Seq(None))
  }

  test("S4/S5/S6: projection keeps canonical order, sort is stable, lineage is stamped") {
    val df = Seq(
      ("2024M02", "LU", "CP00", "I15", Some(2.0), "junk"),
      ("2024M01", "LU", "CP00", "I15", Some(1.0), "junk"),
      ("2024M01", "DE", "CP00", "I15", None, "junk"))
      .toDF("time", "geo", "coicop", "unit", "value", "extra")
    val out = SilverTransform.withLineage(
      SilverTransform.sortSeries(SilverTransform.project(df)), "2026-01-01T00:00:00Z", "raw/x.json")
    assert(out.columns.toSeq ==
      Seq("time", "geo", "coicop", "unit", "value", "processed_at_utc", "raw_blob"))
    val rows = out.collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("DE", "LU", "LU"))
    assert(rows.forall(_.getString(5) == "2026-01-01T00:00:00Z"))
    assert(rows.forall(_.getString(6) == "raw/x.json"))
  }

  test("E1 end-to-end: payload -> silver with parsed time") {
    val payload =
      """{"id": ["geo", "time"], "size": [1, 2],
        |"dimension": {"geo": {"category": {"index": {"LU": 0}}},
        |              "time": {"category": {"index": {"2024M01": 0, "2024M02": 1}}}},
        |"value": [105.1, null]}""".stripMargin
    val out = SilverTransform.silver(spark, payload, "2026-01-01T00:00:00Z", "raw/p.json")
    val rows = out.collect()
    assert(rows.length == 2)
    assert(out.columns.toSeq == Seq("time", "geo", "value", "processed_at_utc", "raw_blob"))
    assert(rows(0).getTimestamp(0) == Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(rows.count(_.isNullAt(2)) == 1, "null observation row retained")
  }
}
