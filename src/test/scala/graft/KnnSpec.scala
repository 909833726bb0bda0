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
