package graft

import org.apache.spark.sql.SparkSession

/** Targeted repeat-timing for individual queries — separates real plan
  * regressions from run-to-run JVM noise (the full bench varies ±35%).
  *
  *   sbt "runMain graft.MicroBench <query> [query ...]"
  *   sbt "runMain graft.MicroBench --gate [--update]"
  *
  * Plain mode runs each named query `SPARK_GRAFT_REPS` times (default 3) in
  * one JVM against `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints per-rep
  * seconds.
  *
  * `--gate` is the committed-artifact regression gate: it loads the warm
  * per-query medians from `MICROBENCH.json` (the top-20 most expensive
  * queries, recorded by the previous round), re-times each, and FAILS
  * (exit 1) when any warm median regresses more than `GateRatio`× with an
  * absolute floor of `GateFloorSec` (so a 0.10s→0.14s wobble on a tiny
  * query never trips it). Warm medians are far steadier than the one-shot
  * full bench, so a trip here is a plan regression, not noise. `--update`
  * rewrites the artifact with the fresh medians (run it once per round
  * AFTER the gate passes; commit the file).
  */
object MicroBench {
  val ArtifactPath = "MICROBENCH.json"
  val GateRatio = 1.3
  val GateFloorSec = 0.15

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gateMode = args.contains("--gate")
    val updateArtifact = args.contains("--update")

    val baseline: Map[String, Double] =
      if (gateMode) readArtifact(ArtifactPath) else Map.empty
    val names =
      if (gateMode) baseline.keys.toSeq.sorted
      else {
        val known = args.toSeq.filter(SparkEntry.queries.contains)
        val unknown = args.toSeq.filterNot(a => a.startsWith("--") || known.contains(a))
        if (unknown.nonEmpty)
          System.err.println(s"unknown queries (skipped): ${unknown.mkString(", ")}")
        known
      }
    if (gateMode && names.isEmpty)
      sys.error(s"$ArtifactPath missing or empty — bootstrap with " +
        "`runMain graft.MicroBench --gate --update` after seeding the file " +
        "with {\"<query>\": 0} entries for the tracked set")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val medians = names.map { n =>
      val secs = (1 to reps).map { _ =>
        // between-queries contract: drop pinned plans AND memoized
        // checkpoint frames so every rep pays the query's true cost
        graft.ops.Exec.releaseAll(spark)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s ${secs.map(s => f"$s%.2f").mkString(" ")}")
      n -> secs.sorted.apply(reps / 2)
    }.toMap
    spark.stop()

    if (gateMode) {
      val regressions = medians.toSeq.sorted.flatMap { case (n, m) =>
        val base = baseline(n)
        if (base > 0 && m > base * GateRatio && m - base > GateFloorSec)
          Some(f"$n: warm median $m%.2fs vs recorded $base%.2fs (${m / base}%.2fx)")
        else None
      }
      if (updateArtifact) {
        writeArtifact(ArtifactPath, sfDir, medians)
        println(s"$ArtifactPath updated (${medians.size} queries)")
      }
      if (regressions.nonEmpty) {
        System.err.println("PERF GATE FAILED — warm-median regressions >" +
          s"$GateRatio×:\n  " + regressions.mkString("\n  "))
        sys.exit(1)
      }
      println(f"perf gate OK: ${medians.size} queries within $GateRatio×")
    }
  }

  /** Flat {"query": median_sec, ...} with "_"-prefixed metadata keys. */
  private def readArtifact(path: String): Map[String, Double] = {
    val f = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(f)) Map.empty
    else {
      val txt = java.nio.file.Files.readString(f)
      """"([^"]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filterNot(_._1.startsWith("_"))
        .toMap
    }
  }

  private def writeArtifact(path: String, sfDir: String,
                            medians: Map[String, Double]): Unit = {
    val body = medians.toSeq.sorted
      .map { case (n, s) => f""""$n": ${s}%.3f""" }
      .mkString(",\n  ")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      s"""{\n  "_sf": "${sfDir.replace("\\", "/")}",\n  $body\n}\n""")
  }
}
