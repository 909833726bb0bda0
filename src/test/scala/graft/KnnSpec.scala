package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn

/** Flat (exact) KNN invariants — replicates the reference's self-query test
  * (`/root/reference/src/index_algorithm/flat_index.rs:157-167`): first hit is
  * the query itself with distance ~0, distances ascending, len = min(k, n). */
class KnnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val base = Tables.vectors(spark, sf0001).select("id", "vec").cache()

  test("self-query: first hit is the query row, distance 0, ascending") {
    val q = base.filter($"id" === 200)
      .select($"id".as("query_id"), $"vec".as("query_vec"))
    val hits = Knn.exact(base, q, k = 6)
      .orderBy("distance", "id").collect()
    assert(hits.length == 6)
    assert(hits.head.getAs[Long]("id") == 200L)
    assert(hits.head.getAs[Double]("distance") < 1e-6)
    val ds = hits.map(_.getAs[Double]("distance"))
    assert(ds.sameElements(ds.sorted))
  }

  test("k > n returns all n rows") {
    val tiny = base.limit(3).cache()
    val q = tiny.limit(1).select($"id".as("query_id"), $"vec".as("query_vec"))
    assert(Knn.exact(tiny, q, k = 10).count() == 3)
  }

  test("exactBroadcast equals exactDeclarative: ids, distances, upper bound, both metrics") {
    val qs = base.filter($"id" < 6)
      .select($"id".as("query_id"), $"vec".as("query_vec"))
    for (dist <- Seq("l2sqr", "cosine")) {
      val a = Knn.exactDeclarative(base, qs, k = 7, dist = dist)
        .orderBy("query_id", "distance", "id").collect()
      val b = Knn.exactBroadcast(base.repartition(4), qs, k = 7, dist = dist)
        .orderBy("query_id", "distance", "id").collect()
      assert(a.length == b.length, s"$dist row count")
      a.zip(b).foreach { case (x, y) =>
        assert(x.getAs[Long]("query_id") == y.getAs[Long]("query_id"))
        assert(x.getAs[Long]("id") == y.getAs[Long]("id"), s"$dist id mismatch")
        assert(x.getAs[Double]("distance") == y.getAs[Double]("distance"),
          s"$dist distance mismatch")
      }
    }
    val cut = 1.5
    val bounded = Knn.exactBroadcast(base, qs, k = 10, upperBound = cut)
    assert(bounded.filter($"distance" > cut).count() == 0)
    val exactBounded = Knn.exactDeclarative(base, qs, k = 10, upperBound = cut).count()
    assert(bounded.count() == exactBounded)
  }

  test("top-k equals the k smallest of the full scored scan") {
    val q = base.filter($"id" === 7)
      .select($"id".as("query_id"), $"vec".as("query_vec"))
    val topk = Knn.exact(base, q, k = 8).select("id").as[Long].collect().toSet
    val full = base.crossJoin(broadcast(q))
      .select($"id", graft.functions.VectorFunctions.vecL2Sq($"vec", $"query_vec").as("d"))
      .orderBy($"d", $"id").limit(8).select("id").as[Long].collect().toSet
    assert(topk == full)
  }

  test("near-tie boundary: dense ties at the k-th distance resolve identically on both paths") {
    // Constructed tie groups: 16 one-hot ±1 points all at L2²=1 from the
    // origin query, 28 two-hot points all at L2²=2 — k cuts INSIDE a tie
    // group, so the (distance, id) tie-break and the broadcast path's float
    // prefilter envelope (Knn.scala) are both load-bearing. Ids are
    // scrambled so insertion order can't mask a wrong tie-break.
    val dim = 8
    val q = Seq((0L, Array.fill(dim)(0f))).toDF("query_id", "query_vec")
    val oneHot = (0 until dim).flatMap(i => Seq(1f, -1f).map { s =>
      val v = Array.fill(dim)(0f); v(i) = s; v
    })
    val twoHot = (0 until dim).flatMap(i => (i + 1 until dim).map { j =>
      val v = Array.fill(dim)(0f); v(i) = 1f; v(j) = 1f; v
    })
    val tied = (oneHot ++ twoHot).zipWithIndex
      .map { case (v, i) => ((i * 37 % 101).toLong * 1000 + i, v) }
      .toDF("id", "vec").repartition(5).cache()
    for (k <- Seq(10, 16, 20, 30)) {
      val a = Knn.exactDeclarative(tied, q, k = k).orderBy("distance", "id")
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("distance"))).toSeq
      val b = Knn.exactBroadcast(tied, q, k = k).orderBy("distance", "id")
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("distance"))).toSeq
      assert(a == b, s"k=$k tie boundary differs between paths")
      assert(a.length == k)
    }
  }

  test("high-cancellation cosine: near-parallel vectors rank identically on both paths") {
    val dim = 8
    val rnd = new scala.util.Random(99)
    val baseDir = Array.fill(dim)(rnd.nextFloat() + 0.5f)
    // 50 directions differing from the query by one component nudged by
    // ~1e-6: cosine distances cluster within ~1e-9 of zero, where float
    // arithmetic cancels — the double-kernel contract must hold on both
    // physical paths
    val nearly = (0 until 50).map { i =>
      val v = baseDir.clone(); v(i % dim) = v(i % dim) + (i - 25) * 1e-6f
      (i.toLong, v)
    }.toDF("id", "vec").repartition(4).cache()
    val qc = Seq((0L, baseDir)).toDF("query_id", "query_vec")
    val a = Knn.exactDeclarative(nearly, qc, k = 9, dist = "cosine")
      .orderBy("distance", "id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("distance"))).toSeq
    val b = Knn.exactBroadcast(nearly, qc, k = 9, dist = "cosine")
      .orderBy("distance", "id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("distance"))).toSeq
    assert(a == b, "cosine cancellation case differs between paths")
  }

  test("upper_bound filters hits") {
    val q = base.filter($"id" === 7)
      .select($"id".as("query_id"), $"vec".as("query_vec"))
    val all = Knn.exact(base, q, k = 20)
    val cut = all.agg(max($"distance")).head().getDouble(0) * 0.5
    val bounded = Knn.exact(base, q, k = 20, upperBound = cut)
    assert(bounded.agg(max($"distance")).head().getDouble(0) <= cut)
    assert(bounded.count() < all.count())
  }
}
