package graft

import org.apache.spark.sql.SparkSession

/** Targeted repeat-timing for individual queries — separates real plan
  * regressions from run-to-run JVM noise (the full bench varies ±35%).
  *
  *   sbt "runMain graft.MicroBench <query> [query ...]"
  *
  * Runs each query `SPARK_GRAFT_REPS` times (default 3) in one JVM against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints per-rep seconds.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.toSeq.filter(SparkEntry.queries.contains)
    val unknown = args.toSeq.diff(names)
    if (unknown.nonEmpty)
      System.err.println(s"unknown queries (skipped): ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val secs = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s ${secs.map(s => f"$s%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
