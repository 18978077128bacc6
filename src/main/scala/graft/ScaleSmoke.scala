package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jsonstat.{JsonStat, JsonStatCube}
import graft.ops.{DedupOps, EventOps}

/** Scale smoke-test main: drives the operators whose 100-TB story depends on
  * staying shuffle-free / signature-bounded, at synthetic row counts far
  * beyond the test SFs, and prints rows/sec. Not part of the driver contract
  * — evidence that the scalable paths hold when the data is 100–1000× the
  * bench SF.
  *
  *   sbt "runMain graft.ScaleSmoke [sfDir]"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String, rows: Long)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","rows":$n,"sec":$sec%.2f,"rows_per_sec":${(rows / sec).toLong}}""")
    }

    // 1. Densifier at 100M cells: the flat index comes from a distributed
    // range — zero driver-side cell materialization, pure codegen decode.
    val dims = Seq(
      "unit" -> (0 until 10).map(i => s"U$i").toIndexedSeq,
      "geo" -> (0 until 100).map(i => s"G$i").toIndexedSeq,
      "coicop" -> (0 until 1000).map(i => s"C$i").toIndexedSeq,
      "time" -> (0 until 100).map(i => f"2016M${i % 12 + 1}%02d").toIndexedSeq)
    val bigCube = JsonStatCube(dims, None, None) // metadata only; values injected below
    timed("s2_densify_100M_cells", bigCube.n) {
      JsonStat.decodeIndex(
          spark.range(bigCube.n).toDF("i").withColumn("value", rand(42)),
          bigCube)
        .filter(col("geo") === "G7")
        .count()
    }

    // 2. MinHash signatures over ~250k documents (docs x 50): constant-size
    // signature per doc, native expression kernels.
    val docs = Tables.documents(spark, sfDir)
    val bigDocs = spark.range(50).crossJoin(docs)
      .withColumn("doc_id", col("id") * 1000000 + col("doc_id"))
      .drop("id")
    graft.functions.MinHashFunctions.register(spark)
    timed("minhash_sig_250k_docs", 50L * docs.count()) {
      // collect() the aggregate value — count() of a global aggregate is
      // optimized away without evaluating the signatures
      bigDocs
        .withColumn("toks", graft.ops.TextOps.tokens(col("text")))
        .withColumn("sig", expr("minhash_sig(shingle_hashes(toks, 3), 32)"))
        .agg(sum(expr("sig[0] % 1000000")).as("s"), count(lit(1)).as("n"))
        .collect()(0).getAs[Long]("n")
    }

    // 3. Sessionization over ~5M events (events x 50 with shifted users):
    // one shuffle on user_id regardless of volume.
    val ev = Tables.events(spark, sfDir)
    val bigEv = spark.range(50).crossJoin(ev)
      .withColumn("user_id", col("user_id") + col("id") * 1000)
      .drop("id")
    timed("sessionize_5M_events", 50L * ev.count()) {
      EventOps.sessionize(bigEv).count()
    }

    // 4. Exact dedup over ~250k docs with manufactured duplicates.
    timed("dedup_exact_250k_docs", 50L * docs.count()) {
      DedupOps.exactDupStats(bigDocs).collect()(0).getAs[Long]("n_distinct_texts")
    }

    spark.stop()
  }
}
