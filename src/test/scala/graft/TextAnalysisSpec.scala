package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Text-analysis operator semantics on constructed fixtures (token counts,
  * lexicon hits, argmax/tie rules, quality-score components). */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("stats: token counts, distinct count, avg length, regex tokens") {
    val df = Seq((1L, "aa bb aa cc"), (2L, "x")).toDF("doc_id", "text")
    val s = TextAnalysis.stats(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(s(1L).getAs[Int]("n_tokens") == 4)
    assert(s(1L).getAs[Int]("n_distinct") == 3)
    assert(math.abs(s(1L).getAs[Double]("avg_token_len") - 2.0) < 1e-9)
    assert(s(2L).getAs[Int]("n_tokens") == 1)
  }

  test("regex tokenizer splits punctuation and digit runs") {
    val df = Seq((1L, "don't stop 42 times!")).toDF("doc_id", "text")
    val n = TextAnalysis.stats(df).select("n_regex_tokens").head().getInt(0)
    // don ' t stop 42 times ! → 7
    assert(n == 7)
  }

  test("langId: real function words pick the right language; und when none") {
    val df = Seq(
      (1L, "the cat is not with a dog"),
      (2L, "der hund ist nicht mit der katze und"),
      (3L, "qqq www eee")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("langId tie goes to alphabetically-first language") {
    // "la" is in both es and fr lexicons → 1-1 tie → 'es' (es < fr; de/en 0)
    val df = Seq((1L, "la casa")).toDF("doc_id", "text")
    val r = TextAnalysis.langId(df).head()
    assert(r.getAs[Int]("es_hits") == 1 && r.getAs[Int]("fr_hits") == 1)
    assert(r.getAs[String]("predicted_lang") == "es")
  }

  test("winnowFingerprints matches a plain-Scala winnowing reference") {
    val k = 8; val w = 4
    def ref(text: String): Set[Long] = {
      if (text.length < k + w - 1) Set.empty
      else {
        val hs = (0 to text.length - k).map { i =>
          text.substring(i, i + k).foldLeft(0L)((acc, c) =>
            (acc * 257L + c.toLong) % 1000000007L)
        }
        (0 to hs.length - w).map(p => hs.slice(p, p + w).min).toSet
      }
    }
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // identical to 1
      (3L, "a different document that shares the quick brown fox phrase"),
      (4L, "short")) // below k + w - 1: no fingerprints
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, k, w).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("fp")).toSet).toMap
    val texts = Map(1L -> "the quick brown fox jumps over the lazy dog",
      3L -> "a different document that shares the quick brown fox phrase")
    assert(got(1L) == ref(texts(1L)))
    assert(got(3L) == ref(texts(3L)))
    assert(got(1L) == got(2L), "identical docs must fingerprint identically")
    assert(got(1L).intersect(got(3L)).nonEmpty,
      "shared phrase must produce shared fingerprints")
    assert(!got.contains(4L), "sub-window doc must be omitted")
  }

  test("qualityScore: components bounded, repetitive text scores lower") {
    val rep = ("spam " * 200).trim
    val good = (0 until 150).map(i => if (i % 7 == 0) "the" else s"w$i").mkString(" ")
    val df = Seq((1L, rep), (2L, good)).toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(2L) > q(1L))
  }
}
