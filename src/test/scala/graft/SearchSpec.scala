package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Search}

/** Flagship metadata search invariants — ports the search-side assertions of
  * `/root/reference/examples/test_pyo3.py` and
  * `/root/reference/src/database/metadata_vec_table.rs:164-212`:
  * pattern-filtered search returns only matching rows, metadata is attached
  * to every hit, `upper_bound` is respected, ordering is ascending
  * (distance, id). */
class SearchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val base = Tables.vectorsMeta(spark, sf0001).cache()
  private lazy val queries = base.filter($"id" < 4)
    .select($"id".as("query_id"), $"vec".as("query_vec")).cache()

  test("pattern filter: every hit matches the pattern") {
    val hits = Search.flat(base, queries, k = 5, pattern = Map("parity" -> "even"))
    assert(hits.count() == 4 * 5)
    assert(hits.filter($"meta"("parity") =!= "even").count() == 0)
    // all returned ids really are even
    assert(hits.filter($"id" % 2 =!= 0).count() == 0)
  }

  test("metadata attached to every hit matches the base row") {
    val hits = Search.flat(base, queries, k = 3)
    val joined = hits.join(
      base.select($"id", $"meta"("label").as("base_label")), "id")
    assert(joined.filter($"meta"("label") =!= $"base_label").count() == 0)
    assert(hits.filter($"meta".isNull).count() == 0)
  }

  test("upper_bound respected and equivalent to knn-then-filter") {
    val ub = 1.5
    val hits = Search.flat(base, queries, k = 10, upperBound = ub)
    assert(hits.filter($"distance" > ub).count() == 0)
    val reference = Knn.exact(base.select("id", "vec"), queries, k = 10)
      .filter($"distance" <= ub)
    assert(hits.count() == reference.count())
  }

  test("empty pattern equals plain KNN on the same table") {
    val viaSearch = Search.flat(base, queries, k = 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val viaKnn = Knn.exact(base.select("id", "vec"), queries, k = 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(viaSearch == viaKnn)
  }

  test("pattern with no matching rows yields empty result") {
    val hits = Search.flat(base, queries, k = 5, pattern = Map("parity" -> "nope"))
    assert(hits.count() == 0)
  }

  test("self-query first hit is the query row with ~0 distance, ascending order") {
    val hits = Search.flat(base, queries.filter($"query_id" === 2), k = 4)
      .orderBy("distance", "id").collect()
    assert(hits.head.getAs[Long]("id") == 2L)
    assert(hits.head.getAs[Double]("distance") < 1e-6)
    val ds = hits.map(_.getAs[Double]("distance"))
    assert(ds.sameElements(ds.sorted))
  }
}
