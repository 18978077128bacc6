package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-engine parity of the MD5-61 hash kernel. The fixture values were
  * computed independently with Python hashlib / DuckDB `md5_number_lower`
  * (lower 64 = last 8 digest bytes little-endian, masked to 2^61-1), so these
  * tests pin the EXACT property the DuckDB oracles for minhash-LSH / simhash /
  * winnowing rely on.
  */
class Md5Hash61Spec extends SparkSpec {

  import spark.implicits._

  test("hash61 matches DuckDB md5_number_lower & (2^61-1)") {
    assert(Md5Hash61.hash61("a b c".getBytes("UTF-8")) == 150619623413316519L)
    assert(Md5Hash61.hash61("hello".getBytes("UTF-8")) == 1352512623024632249L)
    assert(Md5Hash61.hash61("the quick brown".getBytes("UTF-8")) == 449621299096661696L)
    assert(Md5Hash61.hash61(Array.emptyByteArray) == 2180578864647471337L)
  }

  test("affine permutation constants and mulAddMod match hugeint reference") {
    // independently computed: (a_s * h + b_s) % M for h = hash61("a b c")
    val h = 150619623413316519L
    val expected = Map(0 -> 628210561524644650L, 1 -> 242793287732584092L,
      31 -> 661348990279186662L)
    expected.foreach { case (s, want) =>
      val (a, b) = Md5Hash61.AB(s)
      assert(Md5Hash61.mulAddMod(a, h, b) == want, s"seed $s")
    }
  }

  test("mulAddMod equals BigInt arithmetic across random inputs") {
    val M = Md5Hash61.M
    val rnd = new scala.util.Random(20260812L)
    def draw(): Long = rnd.nextLong() & M // uniform in [0, M] (M = 2^61-1)
    (1 to 20000).foreach { _ =>
      val (a, h, b) = (draw(), draw(), draw())
      val want = ((BigInt(a) * BigInt(h) + BigInt(b)) mod BigInt(M)).toLong
      assert(Md5Hash61.mulAddMod(a, h, b) == want, s"a=$a h=$h b=$b")
    }
  }

  test("shingle_hashes hashes the space-joined shingle string") {
    MinHashFunctions.register(spark)
    val got = Seq(Tuple1(Seq("a", "b", "c")))
      .toDF("toks")
      .select(expr("shingle_hashes(toks, 3)").as("hs"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(150619623413316519L)) // hash61("a b c")
  }

  test("shingle_hashes emits sorted arrays and sorted_intersect_count equals array_intersect") {
    MinHashFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
      .selectExpr("doc_id", "shingle_hashes(split(lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' '), 3) AS hs")
    val sortedViolations = docs
      .selectExpr("size(filter(transform(hs, (h, i) -> i = 0 OR hs[i - 1] < h), x -> NOT x)) AS bad")
      .agg(sum(col("bad"))).collect()(0).getLong(0)
    assert(sortedViolations == 0L, "shingle_hashes must be strictly ascending")

    val a = docs.selectExpr("doc_id AS ia", "hs AS ha")
    val b = docs.selectExpr("doc_id AS ib", "hs AS hb")
    val mismatches = a.crossJoin(b)
      .selectExpr("sorted_intersect_count(ha, hb) AS fast",
        "size(array_intersect(ha, hb)) AS slow")
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatches == 0L)
  }

  test("simhash61 matches the independent bit-vote reference") {
    SimHash61.register(spark)
    val got = Seq(
      (1L, Seq("a", "b")),
      (2L, "the quick brown fox jumps over the lazy dog".split(" ").toSeq))
      .toDF("doc_id", "toks")
      .select(col("doc_id"), expr("simhash61(toks)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 73800738225570608L)
    assert(got(2L) == 2273132680598880813L)
  }
}
