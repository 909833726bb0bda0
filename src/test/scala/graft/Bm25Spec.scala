package graft

import org.apache.spark.sql.functions._
import graft.operators.Bm25

/** BM25 + RRF semantics against an independent in-test scorer: index
  * statistics, the Okapi formula, tie rules, fusion arithmetic, and a
  * brute-force cross-check on the sf0.001 documents table. */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox"),
    (1L, "the quick quick dog"),
    (2L, "lazy dog sleeps"),
    (3L, "the the the the"),
    (4L, "brown bear brown bear brown"))

  /** Independent scorer: plain Scala, no Spark expressions shared with the
    * implementation under test. */
  private def bm25Ref(docs: Seq[(Long, String)], query: String, k1: Double,
      b: Double): Map[Long, Double] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / toks.size
    val dfm = toks.flatMap(_._2.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size.toDouble }
    val qts = query.toLowerCase.split(" ").filter(_.nonEmpty).distinct
    toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      val s = qts.collect {
        case t if ts.contains(t) =>
          val tf = ts.count(_ == t).toDouble
          val df = dfm(t)
          math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      id -> s
    }.filter(_._2 > 0.0).toMap
  }

  test("buildIndex: postings carry tf, dl, df; corpus stats integer-exact") {
    val idx = Bm25.buildIndex(corpus.toDF("doc_id", "text"))
    assert(idx.docCount == 5)
    // 4+4+3+4+5 = 20 tokens / 5 docs
    assert(idx.avgDl == 4.0)
    val p = idx.postings.collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Int]("tf"), r.getAs[Int]("dl"), r.getAs[Long]("df"))).toMap
    assert(p(("quick", 1L)) == ((2, 4, 2)))  // tf=2, dl=4, df=2 (docs 0,1)
    assert(p(("the", 3L)) == ((4, 4, 3)))    // df: docs 0,1,3
    assert(p(("brown", 4L)) == ((3, 5, 2)))  // docs 0,4
    assert(!p.contains(("", 3L)))
  }

  test("search matches the independent scorer on every query") {
    val idx = Bm25.buildIndex(corpus.toDF("doc_id", "text"))
    val queries = Seq((10L, "quick dog"), (11L, "brown"), (12L, "the lazy dog"))
    val got = Bm25.search(idx, queries.toDF("query_id", "text"), k = 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Double]("score"), r.getAs[Int]("rank"))).toMap
    for ((qid, qtext) <- queries) {
      val ref = bm25Ref(corpus, qtext, 1.2, 0.75)
      val mine = got.collect { case ((q, d), (s, _)) if q == qid => d -> s }
      assert(mine.keySet == ref.keySet, s"query $qid doc set")
      for ((d, s) <- mine)
        assert(math.abs(s - ref(d)) < 1e-8, s"query $qid doc $d: $s vs ${ref(d)}")
      // ranks are 1..n in (score desc, doc_id asc) order
      val ranked = got.collect { case ((q, d), (s, r)) if q == qid => (r, d, s) }
        .toSeq.sortBy(_._1)
      assert(ranked.map(_._1) == (1 to ranked.size))
      val resorted = ranked.sortBy { case (_, d, s) => (-s, d) }
      assert(resorted == ranked, s"query $qid rank order")
    }
  }

  test("k bounds the result and equal scores break ties by doc_id") {
    // two identical docs → identical scores; doc_id must decide
    val docs = Seq((7L, "alpha beta"), (3L, "alpha beta"), (9L, "gamma"))
    val idx = Bm25.buildIndex(docs.toDF("doc_id", "text"))
    val hits = Bm25.search(idx, Seq((0L, "alpha")).toDF("query_id", "text"), k = 1)
      .collect()
    assert(hits.length == 1)
    assert(hits.head.getAs[Long]("doc_id") == 3L)
  }

  test("non-matching queries return no rows; blank text yields no terms") {
    val idx = Bm25.buildIndex(corpus.toDF("doc_id", "text"))
    val out = Bm25.search(idx,
      Seq((1L, "zzz yyy"), (2L, "  ")).toDF("query_id", "text"), k = 5)
    assert(out.count() == 0)
  }

  test("save/load: build once, serve across sessions bit-identically") {
    val docs = corpus.toDF("doc_id", "text")
    val idx = Bm25.buildIndex(docs)
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "bm25_idx").toString
    Bm25.save(idx, dir)
    val reloaded = Bm25.load(spark, dir)
    // corpus scalars round-trip EXACTLY (stored as the integers they
    // derive from — a double avgdl would drift the normalization)
    assert(reloaded.docCount == idx.docCount)
    assert(reloaded.avgDl == idx.avgDl)
    val q = Seq((0L, "quick dog"), (1L, "brown")).toDF("query_id", "text")
    def rows(i: Bm25.Index) = Bm25.search(i, q, k = 5)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSeq
    assert(rows(reloaded) == rows(idx))
  }

  test("rrfFuse: hand-computed fusion, missing-arm zeros, tie by id") {
    val text = Seq((0L, 100L, 1), (0L, 101L, 2)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((0L, 101L, 1), (0L, 102L, 2)).toDF("query_id", "id", "rank")
    val fused = Bm25.rrfFuse(text, vec, k = 10).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("rrf"), r.getAs[Int]("rank"))).toMap
    val e101 = 1.0 / 62 + 1.0 / 61
    val e100 = 1.0 / 61
    val e102 = 1.0 / 62
    assert(math.abs(fused(101L)._1 - e101) < 1e-12)
    assert(math.abs(fused(100L)._1 - e100) < 1e-12)
    assert(math.abs(fused(102L)._1 - e102) < 1e-12)
    assert(fused(101L)._2 == 1)
    // 100 (1/61) beats 102 (1/62); equal would fall to id asc
    assert(fused(100L)._2 == 2 && fused(102L)._2 == 3)

    // exact tie: same single-arm rank on both sides → id decides
    val a = Seq((0L, 5L, 1)).toDF("query_id", "doc_id", "rank")
    val bb = Seq((0L, 2L, 1)).toDF("query_id", "id", "rank")
    val tied = Bm25.rrfFuse(a, bb, k = 10).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id")))
    assert(tied.sorted.toSeq == Seq((1, 2L), (2, 5L)))
  }

  test("hybridSearch fuses the exact-cosine arm with the bm25 arm") {
    val docsDf = Tables.docs(spark, sf0001)
    val vecs = Tables.vectors(spark, sf0001)
    val queries = docsDf.filter(col("doc_id") < 3)
      .join(vecs, col("doc_id") === col("id"))
      .select(col("doc_id").as("query_id"), col("text"), col("vec").as("query_vec"))
    val out = Bm25.hybridSearch(docsDf, vecs, queries, k = 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every query's self-document must fuse to rank 1: it is the cosine-arm
    // rank-1 (distance 0) and its own text's best BM25 match or close — but
    // only the cosine arm is guaranteed, so assert it appears in the top-5
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    for ((q, rs) <- byQ)
      assert(rs.exists(_.getAs[Long]("id") == q), s"query $q self-hit missing")
    // ranks well-formed
    for ((q, rs) <- byQ)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
  }

  test("sf0.001 brute-force cross-check on real corpus text") {
    val docsDf = Tables.docs(spark, sf0001)
    val local = docsDf.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val q = "key agg row scan"
    val got = Bm25.searchDocs(docsDf, Seq((0L, q)).toDF("query_id", "text"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
    val ref = bm25Ref(local, q, 1.2, 0.75).toSeq.sortBy { case (d, s) => (-s, d) }.take(10)
    assert(got.map(_._1).toSeq == ref.map(_._1))
    for (((d, s), (rd, rs)) <- got.zip(ref))
      assert(math.abs(s - rs) < 1e-8, s"doc $d: $s vs $rs")
  }
}
