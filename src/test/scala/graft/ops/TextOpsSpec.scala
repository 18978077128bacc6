package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("repetition stats: looped text flags, varied text passes, short docs are safe") {
    val looped = Seq.fill(30)("buy now").mkString(" ")          // one bigram dominates
    val varied = "the quick brown fox jumps over the lazy dog while rain falls softly"
    val df = Seq((1L, looped), (2L, varied), (3L, "single"), (4L, ""))
      .toDF("doc_id", "text")
    val rows = TextOps.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(rows(1L).getAs[Boolean]("is_repetitive"),
      "a looping bigram must flag as repetitive")
    assert(rows(1L).getAs[Double]("top_bigram_frac") > 0.4)
    assert(!rows(2L).getAs[Boolean]("is_repetitive"),
      "varied natural text must not flag")
    // 1-token docs have no bigrams: frac 0, distinct ratio 1, no flag, no crash
    assert(rows(3L).getAs[Double]("top_bigram_frac") == 0.0)
    assert(!rows(3L).getAs[Boolean]("is_repetitive"))
    assert(rows.contains(4L), "empty text must still produce a row")
  }

  test("repetition stats: distinct ratio is exact on a known composition") {
    // 10 tokens, 5 distinct -> ratio 0.5; not < 0.5, so ratio alone must not flag
    val text = "a b c d e a b c d e"
    val r = TextOps.repetitionStats(Seq((1L, text)).toDF("doc_id", "text"))
      .collect()(0)
    assert(r.getAs[Int]("n_tokens") == 10)
    assert(r.getAs[Double]("distinct_ratio") == 0.5)
  }
}
