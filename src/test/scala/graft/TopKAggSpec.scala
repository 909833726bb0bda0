package graft

import org.apache.spark.sql.functions._
import graft.operators.TopK

/** Native top-k aggregate vs the sort-based oracle — replicates the
  * reference's `ResultSet` semantics
  * (`/root/reference/src/index_algorithm/candidate_pair.rs:31-74`):
  * k smallest by (distance, id), ascending, deterministic tie-break. */
class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val scored = (0 until 500)
    .map(i => (i.toLong % 7, i.toLong, ((i * 37) % 101).toDouble / 10.0))
    .toDF("g", "id", "d")
    .repartition(4) // force partial buffers + merge across partitions
    .cache()

  test("top-k equals orderBy(distance, id).limit(k) per group") {
    val got = scored.groupBy("g")
      .agg(TopK.topK(5)($"id", $"d").as("topk"))
      .select($"g", explode($"topk").as("h"))
      .select($"g", $"h.id", $"h.distance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = scored
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy($"d", $"id")))
      .filter($"rn" <= 5).select($"g", $"id", $"d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("result array is ascending (distance, id) with ties broken by id") {
    val dup = Seq((0L, 10L, 1.0), (0L, 3L, 1.0), (0L, 7L, 1.0), (0L, 1L, 0.5))
      .toDF("g", "id", "d").repartition(3)
    val arr = dup.groupBy("g").agg(TopK.topK(3)($"id", $"d").as("topk"))
      .select($"topk").head().getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(r => (r.getDouble(1), r.getLong(0))) ==
      Seq((0.5, 1L), (1.0, 3L), (1.0, 7L)))
  }

  test("k larger than group size returns whole group") {
    val n = scored.filter($"g" === 0).count()
    val arr = scored.filter($"g" === 0).groupBy("g")
      .agg(TopK.topK(10000)($"id", $"d").as("topk"))
      .select(size($"topk")).head().getInt(0)
    assert(arr == n)
  }

  test("payload variant carries the right payload per hit") {
    val df = scored.withColumn("p", concat(lit("row-"), $"id"))
    val hits = df.groupBy("g")
      .agg(TopK.topKRows(4)($"id", $"d", $"p").as("topk"))
      .select(explode($"topk").as("h"))
      .select($"h.id", $"h.payload")
      .collect()
    assert(hits.nonEmpty)
    hits.foreach(r => assert(r.getString(1) == s"row-${r.getLong(0)}"))
  }

  test("null distances are skipped") {
    val df = Seq((0L, 1L, Some(1.0)), (0L, 2L, None), (0L, 3L, Some(0.1)))
      .toDF("g", "id", "d")
    val arr = df.groupBy("g").agg(TopK.topK(5)($"id", $"d").as("topk"))
      .select(size($"topk")).head().getInt(0)
    assert(arr == 2)
  }
}
