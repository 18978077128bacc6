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
