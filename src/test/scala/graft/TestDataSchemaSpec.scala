package graft

import org.apache.spark.sql.types._

/** Canary for driver-side test-data regeneration (TESTDATA.md).
  *
  * Round 8 shipped 18 red correctness rows because `events.parquet`'s `ts`
  * column silently changed layout (INT64 TIMESTAMP(NANOS) → timestamp[us])
  * between rounds and every events query failed analysis far from the cause.
  * This spec pins the schema of every driver table AS SPARK READS IT, so the
  * next regeneration fails loudly in ONE place with a message naming the
  * drifted table/column instead of as scattered analysis errors.
  *
  * Timestamps are asserted as "some timestamp type" (NTZ vs LTZ depends on
  * the writer's isAdjustedToUTC flag and Spark's inferTimestampNTZ — both
  * fine under the UTC session timezone all entrypoints set).
  */
class TestDataSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def isTs(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private def assertSchema(table: String,
                           expected: Seq[(String, DataType => Boolean, String)]): Unit = {
    val actual = Tables.table(spark, dir, table).schema
    val actualStr = actual.fields.map(f => s"${f.name}: ${f.dataType.simpleString}")
      .mkString("[", ", ", "]")
    assert(actual.fields.map(_.name).toSeq == expected.map(_._1),
      s"TESTDATA DRIFT: $table columns changed; now $actualStr")
    expected.zip(actual.fields).foreach { case ((name, ok, want), f) =>
      assert(ok(f.dataType),
        s"TESTDATA DRIFT: $table.$name is now ${f.dataType.simpleString} (expected $want) — " +
          s"full schema $actualStr; fix the adapter in Tables.scala and re-run Verify")
    }
  }

  test("events.parquet layout: ts is a timestamp (or legacy ns long) — Tables.events adapts") {
    // Must precede the raw read: if the data drifts back to INT64
    // TIMESTAMP(NANOS), Spark 4 throws "Illegal Parquet type" at schema read
    // without this, making the LongType-acceptance branch below unreachable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = Tables.table(spark, dir, "events").schema
    val tsType = raw("ts").dataType
    assert(isTs(tsType) || tsType == LongType,
      s"TESTDATA DRIFT: events.ts is now ${tsType.simpleString}; Tables.events " +
        "knows the timestamp[us] and INT64-ns layouts only — add a branch")
    // the adapter contract every ev_* operator consumes: µs timestamp + exact ns long
    val adapted = Tables.events(spark, dir).schema
    assert(adapted("ts").dataType == TimestampType,
      s"Tables.events must expose ts as TIMESTAMP, got ${adapted("ts").dataType.simpleString}")
    assert(adapted("ts_ns").dataType == LongType,
      s"Tables.events must expose ts_ns as BIGINT, got ${adapted("ts_ns").dataType.simpleString}")
  }

  test("star-schema tables match the pinned TESTDATA.md layout") {
    assertSchema("region", Seq(
      ("r_regionkey", (d: DataType) => d == IntegerType, "int"),
      ("r_name", (d: DataType) => d == StringType, "string")))
    assertSchema("nation", Seq(
      ("n_nationkey", (d: DataType) => d == IntegerType, "int"),
      ("n_name", (d: DataType) => d == StringType, "string"),
      ("n_regionkey", (d: DataType) => d == IntegerType, "int")))
    assertSchema("customer", Seq(
      ("c_custkey", (d: DataType) => d == LongType, "bigint"),
      ("c_name", (d: DataType) => d == StringType, "string"),
      ("c_nationkey", (d: DataType) => d == IntegerType, "int"),
      ("c_acctbal", (d: DataType) => d == DoubleType, "double"),
      ("c_mktsegment", (d: DataType) => d == StringType, "string")))
    assertSchema("supplier", Seq(
      ("s_suppkey", (d: DataType) => d == LongType, "bigint"),
      ("s_name", (d: DataType) => d == StringType, "string"),
      ("s_nationkey", (d: DataType) => d == IntegerType, "int"),
      ("s_acctbal", (d: DataType) => d == DoubleType, "double")))
    assertSchema("part", Seq(
      ("p_partkey", (d: DataType) => d == LongType, "bigint"),
      ("p_name", (d: DataType) => d == StringType, "string"),
      ("p_brand", (d: DataType) => d == StringType, "string"),
      ("p_type", (d: DataType) => d == StringType, "string"),
      ("p_size", (d: DataType) => d == IntegerType, "int"),
      ("p_retailprice", (d: DataType) => d == DoubleType, "double")))
    assertSchema("orders", Seq(
      ("o_orderkey", (d: DataType) => d == LongType, "bigint"),
      ("o_custkey", (d: DataType) => d == LongType, "bigint"),
      ("o_orderstatus", (d: DataType) => d == StringType, "string"),
      ("o_totalprice", (d: DataType) => d == DoubleType, "double"),
      ("o_orderdate", isTs _, "timestamp"),
      ("o_orderpriority", (d: DataType) => d == StringType, "string")))
    assertSchema("lineitem", Seq(
      ("l_orderkey", (d: DataType) => d == LongType, "bigint"),
      ("l_partkey", (d: DataType) => d == LongType, "bigint"),
      ("l_suppkey", (d: DataType) => d == LongType, "bigint"),
      ("l_linenumber", (d: DataType) => d == IntegerType, "int"),
      ("l_quantity", (d: DataType) => d == DoubleType, "double"),
      ("l_extendedprice", (d: DataType) => d == DoubleType, "double"),
      ("l_discount", (d: DataType) => d == DoubleType, "double"),
      ("l_tax", (d: DataType) => d == DoubleType, "double"),
      ("l_returnflag", (d: DataType) => d == StringType, "string"),
      ("l_linestatus", (d: DataType) => d == StringType, "string"),
      ("l_shipdate", isTs _, "timestamp")))
    assertSchema("documents", Seq(
      ("doc_id", (d: DataType) => d == LongType, "bigint"),
      ("text", (d: DataType) => d == StringType, "string"),
      ("lang", (d: DataType) => d == StringType, "string"),
      ("source", (d: DataType) => d == StringType, "string"),
      ("n_chars", (d: DataType) => d == LongType, "bigint")))
    assertSchema("embeddings", Seq(
      ("vec_id", (d: DataType) => d == LongType, "bigint"),
      ("embedding", (d: DataType) => d == ArrayType(FloatType) ||
        d == ArrayType(FloatType, containsNull = false), "array<float>"),
      ("label", (d: DataType) => d == IntegerType, "int")))
  }
}
