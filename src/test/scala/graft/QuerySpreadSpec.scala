package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Knn, QuerySpread}

/** The statistics-driven query-side parallelism policy: small batches with
  * a known row count are clamped to few tasks, unknown-cardinality plans
  * keep full cluster width, and the clamped serving path returns the same
  * rows as the declarative exact scan. */
class QuerySpreadSpec extends SparkTestBase {
  import spark.implicits._

  private val par = spark.sparkContext.defaultParallelism

  test("cached tiny batch clamps to one task") {
    val q = Tables.vectors(spark, sf0001)
      .limit(8)
      .select($"id".as("query_id"), $"vec".as("query_vec"))
      .cache()
    q.count() // materialize so InMemoryRelation reports an exact rowCount
    val spread = QuerySpread(q.as[(Long, Array[Float])])
    assert(spread.rdd.getNumPartitions == 1,
      s"8 known rows should occupy 1 task, got ${spread.rdd.getNumPartitions}")
  }

  test("limit(n) reports n and clamps proportionally") {
    val q = Tables.vectors(spark, sf0001)
      .limit(40)
      .select($"id".as("query_id"), $"vec".as("query_vec"))
    val spread = QuerySpread(q.as[(Long, Array[Float])])
    // ceil(40/32) = 2 tasks; an already-narrower input may stay as-is
    assert(spread.rdd.getNumPartitions <= 2,
      s"40 known rows should occupy <=2 tasks, got ${spread.rdd.getNumPartitions}")
  }

  test("unknown cardinality keeps full cluster width") {
    // a filter hides the row count from the size-only stats visitor
    val q = Tables.vectors(spark, sf0001)
      .filter($"id" >= 0)
      .select($"id".as("query_id"), $"vec".as("query_vec"))
      .coalesce(1)
    val spread = QuerySpread(q.as[(Long, Array[Float])])
    assert(spread.rdd.getNumPartitions == par,
      s"unknown count from 1 partition should widen to $par, got " +
        s"${spread.rdd.getNumPartitions}")
  }

  test("clamped serving path equals the declarative exact scan") {
    val base = Tables.vectors(spark, sf0001).select("id", "vec").cache()
    val q = base.limit(5)
      .select($"id".as("query_id"), $"vec".as("query_vec")).cache()
    q.count()
    val idx = Hnsw.buildIndex(base.coalesce(1)).cache()
    // ef >= table size: the beam covers the whole graph, so HNSW == exact
    val n = base.count().toInt
    val viaClamp = Hnsw.searchBroadcast(idx, q, k = 10, ef = Some(n))
      .orderBy("query_id", "distance", "id").select("query_id", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = Knn.exact(base, q, k = 10)
      .orderBy("query_id", "distance", "id").select("query_id", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaClamp == exact)
  }
}
