package graft.jsonstat

/** Deterministic JSON-stat fixture shared by the driver-facing `s2_densify`
  * query and its hand-derivable oracle (FIXTURES.md §A1). The cube is
  * multi-dimensional AND sparse so the query exercises the row-major index
  * arithmetic and the kept-null semantics at once.
  */
object Fixtures {

  /** 2 units x 2 geos x 6 months = 24 cells, sparse (7 cells missing). */
  val sparseCube: String =
    """{ "meta": { "dataset": "prc_hicp_midx", "pipeline_stage": "bronze/raw" },
      |  "data": {
      |    "id":   ["unit", "geo", "time"],
      |    "size": [2, 2, 6],
      |    "dimension": {
      |      "unit": {"category": {"index": {"I15": 0, "RCH_A": 1}}},
      |      "geo":  {"category": {"index": {"LU": 0, "DE": 1}}},
      |      "time": {"category": {"index": {
      |        "2024M01": 0, "2024M02": 1, "2024M03": 2,
      |        "2024M04": 3, "2024M05": 4, "2024M06": 5}}}
      |    },
      |    "value": {"0": 105.1, "1": 105.6, "2": 106.0, "4": 106.4, "5": 106.9,
      |              "6": 104.2, "7": 104.8, "9": 105.3, "11": 105.9,
      |              "12": 3.1, "14": 2.9, "15": 2.7, "17": 2.4,
      |              "18": 3.4, "20": 3.0, "22": 2.6, "23": 2.5} } }""".stripMargin

  /** Expected tidy rows, derived by the driver-side reference enumeration —
    * independent of the distributed decode under test.
    */
  def expectedRows: Seq[(String, String, String, Option[Double])] = {
    val cube = JsonStat.parse(sparseCube)
    JsonStat.densifyLocal(cube).map { case (codes, v) =>
      (codes("unit"), codes("geo"), codes("time"), v)
    }
  }

  /** Error-branch fixtures (FIXTURES.md §A1 "error cases"): each payload
    * violates exactly ONE validation of the reference flattener
    * (`process_hicp_silver.py:70–89, 38, 104`), paired with the message
    * fragment the loud failure must carry. Consumed by the registered
    * `s2_densify_errors` query, which asserts that every branch raises at
    * parse/analysis time — silent mis-densification is the failure mode
    * this guards against.
    */
  val errorPayloads: Seq[(String, String, String)] = Seq(
    ("missing_dimension",
      """{"id":["geo"],"size":[1],"value":[1.0]}""",
      "missing 'dimension' or 'value'"),
    ("missing_value",
      """{"id":["geo"],"size":[1],
        |"dimension":{"geo":{"category":{"index":{"LU":0}}}}}""".stripMargin,
      "missing 'dimension' or 'value'"),
    ("missing_id_size",
      """{"dimension":{"geo":{"category":{"index":{"LU":0}}}},"value":[1.0]}""",
      "missing 'id' or 'size'"),
    ("id_size_length_mismatch",
      """{"id":["geo","time"],"size":[1],
        |"dimension":{"geo":{"category":{"index":{"LU":0}}}},
        |"value":[1.0]}""".stripMargin,
      "id/size length mismatch"),
    ("named_dimension_absent",
      """{"id":["geo","time"],"size":[1,1],
        |"dimension":{"geo":{"category":{"index":{"LU":0}}}},
        |"value":[1.0]}""".stripMargin,
      "dimension 'time' missing"),
    ("codes_vs_declared_size",
      """{"id":["geo"],"size":[2],
        |"dimension":{"geo":{"category":{"index":{"LU":0}}}},
        |"value":[1.0,2.0]}""".stripMargin,
      "1 codes != declared size 2"),
    ("value_length_vs_product",
      """{"id":["geo","time"],"size":[1,3],
        |"dimension":{"geo":{"category":{"index":{"LU":0}}},
        |  "time":{"category":{"index":{"2024M01":0,"2024M02":1,"2024M03":2}}}},
        |"value":[1.0,2.0]}""".stripMargin,
      "value length 2 != product of sizes 3"),
    ("unsupported_index_type",
      """{"id":["geo"],"size":[1],
        |"dimension":{"geo":{"category":{"index":"LU"}}},
        |"value":[1.0]}""".stripMargin,
      "unsupported category.index type"),
    ("unsupported_value_type",
      """{"id":["geo"],"size":[1],
        |"dimension":{"geo":{"category":{"index":{"LU":0}}}},
        |"value":"105.1"}""".stripMargin,
      "unsupported value type"))

  /** DuckDB VALUES oracle for the expected rows (sorted to match the query). */
  def expectedValuesSql: String = {
    val rows = expectedRows.sortBy(r => (r._1, r._2, r._3)).map { case (u, g, t, v) =>
      val vs = v.map(d => s"CAST($d AS DOUBLE)").getOrElse("CAST(NULL AS DOUBLE)")
      s"('$u', '$g', '$t', $vs)"
    }
    s"""SELECT * FROM (VALUES ${rows.mkString(", ")})
       |AS t(unit, geo, time_code, value)
       |ORDER BY unit, geo, time_code""".stripMargin
  }
}
