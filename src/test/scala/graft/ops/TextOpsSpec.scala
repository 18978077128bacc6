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

  test("filter decisions: first failing rule wins; clean docs keep") {
    val docs = Seq(
      (1L, "a b c"), // 3 tokens -> too_short
      (2L, ("x y " * 30).trim), // 60 tokens, 2 distinct -> low_diversity fires before repetitive
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12")) // clean
      .toDF("doc_id", "text")
    val got = TextOps.filterDecisions(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), r.getString(3))).toMap
    assert(got(1L) == (false, "too_short"))
    assert(got(2L) == (false, "low_diversity"))
    assert(got(3L) == (true, "ok"))
  }

  test("cross-doc n-grams: shared boilerplate found, doc-internal repeats not double-counted") {
    val boiler = "this content is provided as is for you"
    val df = Seq(
      (1L, s"$boiler and more words follow here now"),
      (2L, s"totally different opening text then $boiler"),
      // doc 3 contains the boilerplate TWICE — must still count once
      (3L, s"$boiler $boiler"),
      (4L, "unrelated text with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    val rows = TextOps.crossDocNgrams(df, n = 8, minDocs = 2, k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows(boiler) == 3L,
      s"8-gram '$boiler' appears in docs 1,2,3 -> df 3; got $rows")
    assert(rows.values.forall(_ >= 2), "minDocs filter must hold")
  }

  test("tf-idf: corpus-universal term scores zero; distinctive term ranks first") {
    val df = Seq(
      (1L, "en", "common common apple apple apple"),
      (2L, "en", "common apple"),
      (3L, "de", "common zug zug zug"))
      .toDF("doc_id", "lang", "text")
    val rows = TextOps.tfidfTopTerms(df, k = 3).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getString(2), r.getDouble(3))).toMap
    // 'common' is in every doc: idf = ln(3/3) = 0 -> score 0 in both langs
    val enScores = rows.collect { case ((l, _), (t, s)) if l == "en" => t -> s }.toMap
    assert(enScores("common") == 0.0)
    // 'apple' (df 2) beats 'common' in en; 'zug' (df 1) ranks first in de
    assert(rows(("en", 1))._1 == "apple")
    assert(rows(("de", 1))._1 == "zug")
    assert(rows(("de", 1))._2 > 0.0)
  }
}
