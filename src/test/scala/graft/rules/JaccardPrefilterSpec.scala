package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}

class JaccardPrefilterSpec extends SparkSpec {

  test("naive Jaccard threshold filters gain the size-ratio prune, results unchanged") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._

      val df = Seq(
        (1L, Seq("a", "b", "c", "d")),
        (2L, Seq("a", "b", "c", "e")),
        (3L, Seq("x")),
        (4L, Seq("a", "b", "c", "d")))
        .toDF("id", "s")
      df.createOrReplaceTempView("sets")
      // naive user query: NO hand-written size prune
      val q = s2.sql(
        """SELECT l.id AS a, r.id AS b,
          |  CAST(size(array_intersect(l.s, r.s)) AS DOUBLE)
          |    / (size(l.s) + size(r.s) - size(array_intersect(l.s, r.s))) AS j
          |FROM sets l JOIN sets r ON l.id < r.id
          |WHERE CAST(size(array_intersect(l.s, r.s)) AS DOUBLE)
          |    / (size(l.s) + size(r.s) - size(array_intersect(l.s, r.s))) >= 0.5
          |""".stripMargin)

      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("least(") && optimized.contains("greatest("),
        s"size-ratio prune not injected:\n$optimized")

      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // J(1,2)=0.6, J(1,4)=1.0, J(2,4)=0.6; pairs with 3 are pruned/below
      assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
