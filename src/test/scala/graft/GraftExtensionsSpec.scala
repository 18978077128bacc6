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
          |  sq_l2(array(0.0D, 3.0D), array(4.0D, 3.0D)) AS d2,
          |  dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS dp,
          |  hash61('a b c') AS h1,
          |  element_at(shingle_hashes(array('a', 'b', 'c'), 3), 1) AS h2
          |""".stripMargin).collect()(0)
      assert(row.getInt(1) == 2)   // 2 distinct 3-gram shingles of 4 tokens
      assert(row.getInt(2) == 16)  // k signature rows
      assert(row.getInt(3) == 2)   // non-distinct keeps both (identical) windows
      assert(row.getInt(4) == 8)   // 8 LSH bands
      assert(row.getInt(5) == 2)   // {3, 5}
      assert(row.getDouble(6) == 1.0)
      assert(row.getDouble(7) == 16.0)
      assert(row.getDouble(8) == 23.0)
      // the scalar hash61 of an n-gram string IS the shingle-kernel hash
      assert(row.getLong(9) == row.getLong(10),
        "hash61 must agree with shingle_hashes on the same n-gram")
      // round-10 additions: rolling hash, geomean + covariance aggregates
      val r2 = s2.sql(
        """SELECT size(rolling_hashes('abcdefgh', 3)) AS n_rh,
          |  element_at(rolling_hashes('xabc', 2), 2) AS rh_sub,
          |  element_at(rolling_hashes('abc', 2), 1) AS rh_head,
          |  (SELECT geomean(v) FROM VALUES (2.0), (8.0) AS t(v)) AS gm,
          |  (SELECT element_at(cov_matrix(a, 2), 1).cov
          |   FROM VALUES (array(1.0D, 0.0D)), (array(3.0D, 0.0D)) AS t(a)) AS var0
          |""".stripMargin).collect()(0)
      assert(r2.getInt(0) == 6)
      // the same byte window hashes identically wherever it occurs
      assert(r2.getLong(1) == r2.getLong(2))
      assert(math.abs(r2.getDouble(3) - 4.0) < 1e-12) // geomean(2, 8) = 4
      assert(math.abs(r2.getDouble(4) - 1.0) < 1e-12) // var of {1, 3} = 1
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("codegen'd kernels compile under CODEGEN_ONLY (no silent interpreter fallback)") {
    // only the scalar per-pair kernels carry doGenCode — the array kernels
    // stay CodegenFallback by measurement (see CODEGEN NOTE in MinHash.scala)
    graft.functions.CosineSim.register(spark)
    graft.functions.SqL2.register(spark)
    graft.functions.DotProduct.register(spark)
    graft.functions.MinHashFunctions.register(spark)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    // CODEGEN_ONLY turns a broken doGenCode into a hard failure instead of
    // a quiet (and slower) interpreted fallback
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // spark.range keeps this off the constant-folding / LocalRelation
      // path, so the expressions really evaluate inside generated code
      graft.functions.RollingHash.register(spark)
      val r = spark.range(1, 4).selectExpr(
        "cosine_sim(array(CAST(id AS DOUBLE), 1.0D), array(CAST(id AS DOUBLE), 1.0D)) AS c",
        "sq_l2(array(CAST(id AS DOUBLE)), array(CAST(id AS DOUBLE) + 3.0D)) AS d2",
        "sorted_intersect_count(array(id, id + 2), array(id + 2, id + 4)) AS i",
        "dot_product(array(CAST(id AS DOUBLE), 3.0D), array(0.0D, 2.0D)) AS dp",
        "size(rolling_hashes(concat('abcdef', CAST(id AS STRING)), 3)) AS rh")
        .collect()
      assert(r.forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-12))
      assert(r.forall(_.getDouble(1) == 9.0))
      assert(r.forall(_.getInt(2) == 1))
      assert(r.forall(_.getDouble(3) == 6.0))
      assert(r.forall(_.getInt(4) == 5))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
