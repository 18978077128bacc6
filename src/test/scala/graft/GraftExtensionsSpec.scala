package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("extensions register native functions for plain SQL on a fresh session") {
    val base = spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s2.sql(
        """SELECT simhash61(array('a', 'b')) AS sh,
          |  size(shingle_hashes(array('a', 'b', 'c', 'd'), 3)) AS n_sh,
          |  size(minhash_sig(shingle_hashes(array('a', 'b', 'c', 'd'), 3), 16)) AS k,
          |  size(shingle_hash_seq(array('x', 'x', 'x', 'x'), 3)) AS n_seq,
          |  size(band_hashes(minhash_sig(shingle_hashes(array('a','b','c','d'), 3), 32))) AS n_bands,
          |  sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS inter,
          |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
          |  sq_l2(array(0.0D, 3.0D), array(4.0D, 3.0D)) AS d2
          |""".stripMargin).collect()(0)
      assert(row.getInt(1) == 2)   // 2 distinct 3-gram shingles of 4 tokens
      assert(row.getInt(2) == 16)  // k signature rows
      assert(row.getInt(3) == 2)   // non-distinct keeps both (identical) windows
      assert(row.getInt(4) == 8)   // 8 LSH bands
      assert(row.getInt(5) == 2)   // {3, 5}
      assert(row.getDouble(6) == 1.0)
      assert(row.getDouble(7) == 16.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
