package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup operator semantics: exact fingerprint groups, n-gram Jaccard join
  * vs a brute-force oracle, MinHash-LSH recall vs the exact join, SimHash
  * order-invariance, and semantic blocking exactness vs the all-pairs join. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixture = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "dog lazy the over jumps fox brown quick the"), // word-permuted dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (3L, "completely different content about spark engines"),
    (4L, "completely different content about spark engines"), // byte-identical dup of 3
    (5L, "one two")                                           // < 3 tokens: no shingles
  ).toDF("doc_id", "text").cache()

  test("exactGroups: permuted and identical docs share a fingerprint group") {
    val g = Dedup.exactGroups(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_size"), r.getAs[Long]("canonical_id"),
          r.getAs[Boolean]("is_duplicate"))).toMap
    assert(g(0L) == (2L, 0L, false))
    assert(g(1L) == (2L, 0L, true)) // permutation → same word set
    assert(g(3L) == (2L, 3L, false))
    assert(g(4L) == (2L, 3L, true))
    assert(g(2L)._1 == 1L && !g(2L)._3)
  }

  test("ngramJaccardJoin matches a brute-force shingle oracle") {
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val texts = fixture.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (for {
      a <- texts.keys; b <- texts.keys if a < b
      sa = sh(texts(a)); sb = sh(texts(b))
      if texts(a).split(" ").length >= 3 && texts(b).split(" ").length >= 3
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.3
    } yield (a, b, math.round(j * 1e6) / 1e6)).toSet
    val got = Dedup.ngramJaccardJoin(fixture, n = 3, threshold = 0.3)
      .select($"a_id", $"b_id", round($"jaccard", 6))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(want.exists(p => p._1 == 0L && p._2 == 2L)) // the near-dup pair is in there
  }

  test("native ngramHashes ≡ declarative hashedShingles (bit-identical)") {
    // the LSH pipeline runs the single-pass native NgramHashes; its
    // declarative twin (token xxhash64 → window xxhash64 → array_distinct)
    // is the oracle. Includes multi-space runs (empty tokens), short docs
    // (< n tokens → empty array), unicode, and empty string.
    val docs = (fixture.as[(Long, String)].collect().toSeq ++ Seq(
      (10L, "a  b   c d"), (11L, ""), (12L, "héllo wörld déjà vu naïve"),
      (13L, " leading and trailing "), (14L, "x y z")))
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val got = docs.select($"doc_id",
        graft.functions.TextFunctions.ngramHashes($"text", n).as("sh"))
      val want = docs.select($"doc_id",
        Dedup.hashedShingles(
          transform(split($"text", " "), t => xxhash64(t)), n).as("sh"))
      val g = got.as[(Long, Seq[Long])].collect().toMap
      val w = want.as[(Long, Seq[Long])].collect().toMap
      assert(g == w, s"n=$n mismatch")
      // hashed sets are in bijection with the string-shingle sets (equal
      // Jaccard): same distinct-set size per doc (values differ — the mix
      // chains token hashes, it does not hash the concatenated string)
      val strSizes = docs.select($"doc_id",
        size(Dedup.shingles($"text", n)).as("ns"))
        .as[(Long, Int)].collect().toMap
      g.foreach { case (id, hs) =>
        assert(hs.toSet.size == strSizes(id), s"n=$n doc $id set size") }
    }
  }

  test("minhashLshJoin: verified pairs ⊆ exact join, recall ≥ 0.9 on documents") {
    val docs = Tables.docs(spark, sf001)
    val exact = Dedup.ngramJaccardJoin(docs, n = 3, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshJoin(docs, n = 3, numHashes = 32, bands = 8,
        threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // exact verification → no false positives
    assert(exact.nonEmpty)
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (found ${lsh.size}/${exact.size})")
  }

  test("duplicateComponents: chains merge, singletons survive, canonical = min") {
    // a 6-node chain (worst case for plain propagation — proves the
    // pointer jumping), a 2-cycle-ish triangle, and isolated nodes
    val docs = (0L to 11L).toDF("doc_id")
    val pairs = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain 0..5
      (6L, 7L), (7L, 8L), (6L, 8L)                      // triangle 6,7,8
    ).toDF("a_id", "b_id")
    val got = Dedup.duplicateComponents(docs, pairs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    for (i <- 0L to 5L) assert(got(i) == (0L, 6L, i == 0L), s"chain node $i")
    for (i <- 6L to 8L) assert(got(i) == (6L, 3L, i == 6L), s"triangle $i")
    for (i <- 9L to 11L) assert(got(i) == (i, 1L, true), s"singleton $i")
    // real pairs end to end: the fixture's ngram join — (0,2) near-dup and
    // the identical (3,4) pair group; the word-PERMUTED doc 1 shares no
    // 3-gram with doc 0 and stays a singleton
    val comp = Dedup.duplicateComponents(fixture,
      Dedup.ngramJaccardJoin(fixture, n = 3, threshold = 0.3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(0L) == 0L && comp(2L) == 0L && comp(1L) == 1L)
    assert(comp(3L) == 3L && comp(4L) == 3L)
    assert(comp(5L) == 5L)
  }

  test("duplicateComponents: deep path converges in O(log L) checkpointed rounds") {
    // a 2^14-node PATH — the diameter-maximizing worst case: plain
    // propagation would need 16k rounds; the doubling bound is ~14 + the
    // propagation interleave. The per-round localCheckpoint keeps each
    // round's plan (and runtime) flat instead of nesting 14 rounds of
    // joins — this fixture regresses visibly (minutes, then the maxIters
    // guard) if either the jumping or the lineage truncation breaks.
    val n = 1 << 14
    val docs = spark.range(n).select(col("id").as("doc_id"))
    val pairs = spark.range(n - 1)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val got = Dedup.duplicateComponents(docs, pairs, maxIters = 25)
    val agg = got.agg(
      countDistinct(col("component_id")).as("ncomp"),
      max(col("component_size")).as("size"),
      sum(when(col("is_canonical"), 1).otherwise(0)).as("ncanon")).head
    assert(agg.getLong(0) == 1L, "one component")
    assert(agg.getLong(1) == n.toLong, "full size")
    assert(agg.getLong(2) == 1L, "single canonical (the min id)")
  }

  test("simhash: word order does not change the sketch; dup pair at hamming 0") {
    val pairs = Dedup.simhashPairs(fixture, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Int]("hamming")))
    assert(pairs.contains((0L, 1L, 0))) // permutation: identical token multiset
    assert(pairs.contains((3L, 4L, 0)))
  }

  test("simhash: maxHamming beyond the structural band range is rejected") {
    // 16 bands of 4 bits are the narrowest pigeonhole split; 16..63 would
    // silently keep pairs beyond the h <= 15 guarantee while the candidate
    // join degenerates toward all-pairs (r19 ADVICE)
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(fixture, maxHamming = 16)
    }
    assert(e.getMessage.contains("0..15"))
    // the boundary value still serves
    assert(Dedup.simhashPairs(fixture, maxHamming = 15).count() >= 2L)
  }

  test("semanticPairs equals the brute-force all-pairs threshold join") {
    val vecs = Tables.vectors(spark, sf0001).select("id", "vec").cache()
    val t2 = 1.3
    val got = Dedup.semanticPairs(vecs, threshold = t2, numBlocks = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val brute = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        graft.functions.VectorFunctions.vecL2Sq(col("a.vec"), col("b.vec")).as("d"))
      .filter($"d" <= t2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture should contain at least one close pair")
    assert(got == brute)
  }

  test("semanticPairs cosine mode: self-normalized pairs, distance in [0, 2]") {
    val vecs = Tables.vectors(spark, sf0001).select("id", "vec")
    val got = Dedup.semanticPairs(vecs, threshold = 0.15, dist = "cosine",
      numBlocks = 8)
    val ds = got.select("distance").as[Double].collect()
    assert(ds.forall(d => d >= 0.0 && d <= 0.15 + 1e-9))
  }

  test("semanticPairs cosine: zero vectors follow the 1e-10 clamp (distance 1)") {
    // clamp semantics (F4): cos_dist(0, x) = 1 for every x — zero vectors
    // are NOT near-dups of each other at any threshold < 1, and pair with
    // everything at exactly 1.0 when the cutoff admits distance 1
    val rows = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), // zero
      (1L, Array(0f, 0f, 0f, 0f)), // zero
      (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(1f, 1e-4f, 0f, 0f))) // near-dup of 2
    val df = rows.toDF("id", "vec")
    val tight = Dedup.semanticPairs(df, threshold = 0.5, dist = "cosine",
      numBlocks = 2).select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(tight == Set((2L, 3L)), s"zero vectors leaked into $tight")
    val loose = Dedup.semanticPairs(df, threshold = 1.0, dist = "cosine",
      numBlocks = 2)
    val zeroPairs = loose.filter($"a_id" <= 1).orderBy("a_id", "b_id")
      .as[(Long, Long, Double)].collect()
    assert(zeroPairs.map(p => (p._1, p._2)).toSet ==
      Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L)))
    assert(zeroPairs.forall(_._3 == 1.0))
  }

  test("semanticPairs degenerate path: many zeros stay bounded + guarded") {
    // 50 zero vectors among 100 rows at threshold >= 1: the degenerate
    // append is |zeros|·(n−1) pairs by construction. Under the cap the
    // result is complete (every zero pairs with every other row, broadcast
    // nested-loop — no shuffle, no unbounded crossJoin); over the cap the
    // pre-count guard fails fast instead of launching the job.
    val rows = (0L until 100L).map { i =>
      if (i < 50) (i, Array(0f, 0f, 0f, 0f))
      else (i, Array(math.cos(i.toDouble).toFloat, math.sin(i.toDouble).toFloat, 1f, 0f))
    }
    val df = rows.toDF("id", "vec")
    val got = Dedup.semanticPairs(df, threshold = 1.0, dist = "cosine",
      numBlocks = 4)
    val zeroTouching = got.filter($"a_id" < 50 || $"b_id" < 50)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = (for {
      z <- 0L until 50L; o <- 0L until 100L if z != o
    } yield (math.min(z, o), math.max(z, o))).toSet
    assert(zeroTouching == expected,
      s"degenerate pairs incomplete: ${expected.size} expected, ${zeroTouching.size} got")
    val ex = intercept[IllegalArgumentException] {
      Dedup.semanticPairs(df, threshold = 1.0, dist = "cosine",
        numBlocks = 4, maxDegeneratePairs = 10L)
    }
    assert(ex.getMessage.contains("maxDegeneratePairs"))
  }
}
