package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn

/** Recall evaluator (A4) + ground-truth generation (B7) — ports
  * `/root/reference/src/index_algorithm/candidate_pair.rs:127-140` and
  * `/root/reference/src/bin/gen_gnd.rs:56-75`. */
class RecallSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val base = Tables.vectors(spark, sf0001).select("id", "vec").cache()
  private lazy val queries = base.filter($"id" < 6)
    .select($"id".as("query_id"), $"vec".as("query_vec"))

  test("exactIds returns ascending-distance id lists headed by the self id") {
    val ids = Knn.exactIds(base, queries, k = 5)
      .select("query_id", "knn_ids").as[(Long, Seq[Long])].collect().toMap
    assert(ids.size == 6)
    ids.foreach { case (q, ks) =>
      assert(ks.length == 5)
      assert(ks.head == q) // self row at distance 0 comes first
    }
  }

  test("recall of a ranking against itself is 1.0; subset is fractional") {
    val gnd = Knn.exactIds(base, queries, k = 10)
    val self = gnd.withColumnRenamed("knn_ids", "pred")
      .join(gnd, "query_id")
      .select((size(array_intersect($"pred", $"knn_ids")) / 10.0).as("r"))
      .as[Double].collect()
    assert(self.forall(_ == 1.0))
    val half = gnd
      .select($"query_id", slice($"knn_ids", 1, 5).as("pred"), $"knn_ids")
      .select((size(array_intersect($"pred", $"knn_ids")) / 10.0).as("r"))
      .as[Double].collect()
    assert(half.forall(_ == 0.5))
  }
}
