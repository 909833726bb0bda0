package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Decontaminate, TextAnalysis}

/** Corpus-prep + decontamination + repetition-signal semantics, each vs an
  * independent in-test (Scala, not Spark) oracle. */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a b c d e f g h i j"),         // 10 tokens
    (1L, "x y z"),                        // shorter than one window
    (2L, "p q r s p q r s p q r s"),      // heavy 4-token repetition
    (3L, "solo"),                         // single token
    (4L, "a b c d e f g h i j")           // duplicate of 0
  ).toDF("doc_id", "text")

  test("chunk: every token covered, stride/window arithmetic vs scala oracle") {
    val got = Corpus.chunk(docs, window = 4, stride = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id")) ->
        (r.getAs[String]("chunk_text"), r.getAs[Int]("n_tokens"))).toMap
    val want = Seq((0L, "a b c d e f g h i j"), (1L, "x y z"),
      (2L, "p q r s p q r s p q r s"), (3L, "solo"), (4L, "a b c d e f g h i j"))
      .flatMap { case (id, text) =>
        val t = text.split(" ")
        (0 until t.length by 3).zipWithIndex.map { case (st, ci) =>
          val c = t.slice(st, st + 4)
          (id, ci) -> (c.mkString(" "), c.length)
        }
      }.toMap
    assert(got == want)
    // coverage: concatenating stride-aligned prefixes reconstructs the doc
    val chunks0 = got.collect { case ((0L, ci), (txt, _)) => ci -> txt }.toSeq
      .sortBy(_._1).map(_._2)
    assert(chunks0.head.startsWith("a b c") && chunks0.last.endsWith("j"))
  }

  test("hashSplit: deterministic, exhaustive, stable under append, ~fractions") {
    val n = 2000
    val big = spark.range(n).select(col("id").as("doc_id"))
    val s1 = Corpus.hashSplit(big, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.values.sum == n)
    assert(math.abs(s1("train") - 0.8 * n) < 0.05 * n, s"train ${s1("train")}")
    assert(math.abs(s1("val") - 0.1 * n) < 0.04 * n)
    // stability: the first 500 ids keep their assignment when 1500 more appear
    val head = Corpus.hashSplit(
      spark.range(500).select(col("id").as("doc_id")),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val full = Corpus.hashSplit(big, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter(col("doc_id") < 500)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(head == full)
    // salt changes the assignment, same salt repeats it
    val salted = Corpus.hashSplit(big, Seq("a" -> 0.5, "b" -> 0.5), salt = "s1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val salted2 = Corpus.hashSplit(big, Seq("a" -> 0.5, "b" -> 0.5), salt = "s1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(salted == salted2)
  }

  test("contaminationPairs matches a brute-force string n-gram oracle") {
    val bench = docs.filter(col("doc_id").isin(0L, 2L))
    val got = Decontaminate.contaminationPairs(docs, bench, n = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id")) ->
        r.getAs[Long]("n_shared")).toMap
    def grams(text: String, n: Int): Set[Seq[String]] =
      text.split(" ").sliding(n).filter(_.length == n).map(_.toSeq).toSet
    val all = Seq((0L, "a b c d e f g h i j"), (1L, "x y z"),
      (2L, "p q r s p q r s p q r s"), (3L, "solo"), (4L, "a b c d e f g h i j"))
    val want = (for {
      (di, dt) <- all
      (bi, bt) <- all if bi == 0L || bi == 2L
      shared = (grams(dt, 3) & grams(bt, 3)).size if shared >= 1
    } yield (di, bi) -> shared.toLong).toMap
    assert(got == want)
    // the pipeline step drops exactly the contaminated ids
    val clean = Decontaminate.decontaminate(docs, bench, n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == all.map(_._1).toSet -- want.keySet.map(_._1))
  }

  test("repetitionSignals matches a brute-force scala n-gram oracle") {
    val got = TextAnalysis.repetitionSignals(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("dup_token_frac") * 1e9).round,
          (r.getAs[Double]("top2gram_frac") * 1e9).round,
          (r.getAs[Double]("dup3gram_frac") * 1e9).round)).toMap
    def sig(text: String): (Long, Long, Long) = {
      val t = text.split(" ", -1)
      val dtf = 1.0 - t.distinct.length.toDouble / t.length
      val g2 = t.sliding(2).filter(_.length == 2).map(_.toSeq).toSeq
      val top2 = if (g2.isEmpty) 0.0
        else g2.groupBy(identity).values.map(_.size).max.toDouble / g2.size
      val g3 = t.sliding(3).filter(_.length == 3).map(_.toSeq).toSeq
      val dup3 = if (g3.isEmpty) 0.0
        else g3.groupBy(identity).values.map(_.size).filter(_ >= 2).sum.toDouble / g3.size
      ((dtf * 1e9).round, (top2 * 1e9).round, (dup3 * 1e9).round)
    }
    for ((id, text) <- Seq((0L, "a b c d e f g h i j"), (1L, "x y z"),
        (2L, "p q r s p q r s p q r s"), (3L, "solo"), (4L, "a b c d e f g h i j")))
      assert(got(id) == sig(text), s"doc $id")
    // sanity on magnitudes: doc 2 is 3/4 repeated 4-grams
    assert(got(2L)._3 == 1e9.toLong, "every 3-gram in doc 2 repeats")
    assert(got(0L)._2 > 0 && got(0L)._3 == 0L)
  }

  test("chunk and repetitionSignals plans are shuffle-free (map-only at 100 TB)") {
    for (df <- Seq(Corpus.chunk(docs), TextAnalysis.repetitionSignals(docs),
        Corpus.hashSplit(docs, Seq("a" -> 0.5, "b" -> 0.5)))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    }
  }
}
