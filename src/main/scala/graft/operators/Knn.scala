package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Exact (brute-force) batch K-nearest-neighbor search — the engine's
  * flagship operator: the reference's `FlatIndex::knn`
  * (`/root/reference/src/index_algorithm/flat_index.rs:48-57`) generalized to
  * a batch of queries, plus the `upper_bound` post-filter
  * (`/root/reference/src/database/metadata_vec_table.rs:206-211`).
  *
  * Physical shape (scale-first):
  *   broadcast(queries) ⋈ base scan          — no shuffle of the base table
  *   → codegen'd distance expression         — stays in whole-stage codegen
  *   → partial top-k per partition (UDAF)    — map-side combine
  *   → shuffle Q×partitions×k tiny rows → final top-k merge.
  *
  * At 100 TB the base side streams through executors once; only
  * O(queries × k) rows ever move.
  *
  * Ordering is ascending (distance, id), replicating the reference's
  * deterministic (distance, index) tie-break
  * (`/root/reference/src/index_algorithm/candidate_pair.rs:31-40`).
  */
object Knn {

  /** Batch exact KNN.
    *
    * @param base     DataFrame with (idCol: long, vecCol: array<float|double>)
    * @param queries  DataFrame with (queryIdCol: long, queryVecCol: array) —
    *                 assumed small enough to broadcast (the query batch)
    * @param dist     "l2sqr" | "cosine" (reference string forms,
    *                 `/root/reference/src/pyo3/mod.rs:15-31`)
    * @param upperBound keep only hits with distance <= upperBound
    * @return (query_id, id, distance) ascending per query
    */
  def exact(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      dist: String = "l2sqr",
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      upperBound: Double = Double.PositiveInfinity): DataFrame =
    topKArrays(base, queries, k, dist, idCol, vecCol, queryIdCol, queryVecCol, upperBound)
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"), col("hit.distance").as("distance"))

  /** Batch exact KNN returning one row per query with the ascending
    * (distance, id)-sorted hit array — the aggregator's native output, no
    * extra shuffle beyond the top-k merge. */
  def topKArrays(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      dist: String = "l2sqr",
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      upperBound: Double = Double.PositiveInfinity): DataFrame = {
    val scored = base
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__vec"))
      .crossJoin(broadcast(
        queries.select(col(queryIdCol).cast("long").as("query_id"),
          col(queryVecCol).as("__qvec"))))
      .select(col("query_id"), col("__id"),
        VectorFunctions.distance(col("__vec"), col("__qvec"), dist).as("__dist"))
      .filter(col("__dist") <= lit(upperBound))

    scored
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("__id"), col("__dist")).as("topk"))
  }

  /** KNN with per-query id arrays — the shape used for ground-truth
    * generation (`/root/reference/src/bin/gen_gnd.rs:56-75`). The aggregator
    * already returns the sorted array, so this is a pure projection. */
  def exactIds(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      dist: String = "l2sqr",
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame =
    topKArrays(base, queries, k, dist, idCol, vecCol, queryIdCol, queryVecCol)
      .select(col("query_id"),
        transform(col("topk"), h => h.getField("id")).as("knn_ids"))
}
