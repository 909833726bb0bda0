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
    * Physically served by [[exactBroadcast]] — same logical result
    * (KnnSpec asserts id/distance equality on both metrics and under
    * upper bounds), but the scan reads primitive float arrays instead of
    * per-pair ArrayData element accessors, which measures ~11× cheaper per
    * pair at a 200M-pair batch. The declarative cross-join shape remains
    * available as [[exactDeclarative]].
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
    exactBroadcast(base, queries, k, dist, idCol, vecCol, queryIdCol,
      queryVecCol, upperBound)

  /** The fully declarative cross-join + bounded-aggregate shape of
    * [[exact]]: broadcast(queries) ⋈ base → codegen'd distance → TopK
    * aggregate. Kept for plan-composition contexts (Catalyst sees every
    * operator) and as the oracle for the serving shape; the per-pair
    * ArrayData access makes it the slower physical choice for batch
    * serving. */
  def exactDeclarative(
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
    val bounded =
      if (upperBound == Double.PositiveInfinity) scored
      else scored.filter(col("__dist") <= lit(upperBound))

    bounded
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("__id"), col("__dist")).as("topk"))
  }

  /** Serving-shape exact KNN: broadcast the query batch, stream the base
    * through `mapPartitions` with per-query primitive top-k buffers, merge
    * the Q×partitions×k partials with the bounded aggregate. Same logical
    * result and scale shape as [[exact]] (base streams once, only tiny
    * partials shuffle) minus the per-pair row machinery of the cross-join
    * plan, which measures ~25× the distance cost at high pair rates.
    *
    * Selection is EXACT: a candidate enters the per-partition top-k only by
    * the double kernel's (distance, id) order. The SIMD float kernel is a
    * conservative prefilter — a row skips the double re-score only when its
    * float distance exceeds the current k-th exact distance by more than
    * the float kernel's error bound (relative `dim · 2⁻²⁴` with a 4×
    * safety factor, plus an absolute guard), so no amount of float-tie
    * pileup at the k boundary can evict a true top-k row. Cosine caches
    * query and row norms so the per-pair prefilter cost is one dot product
    * — the same arithmetic intensity as L2.
    */
  def exactBroadcast(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      dist: String = "l2sqr",
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      upperBound: Double = Double.PositiveInfinity): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol))
      .as[(Long, Array[Float])].collect()
    val bc = spark.sparkContext.broadcast(qs)
    val cosine = dist == "cosine"

    val partial = base
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qarr = bc.value
        val nq = qarr.length
        if (nq == 0 || !it.hasNext) Iterator.empty
        else {
          // per-query bounded buffers in ascending EXACT (distance, id) order
          val bufD = Array.fill(nq)(new Array[Double](k))
          val bufI = Array.fill(nq)(new Array[Long](k))
          val sz = new Array[Int](nq)
          val dim = qarr(0)._2.length
          // float-kernel error envelope: accumulation error grows ~dim·2⁻²⁴
          // relative; 2.4e-7·dim is a 4× margin, the absolute term guards
          // near-zero distances (cosine lives in [0,2])
          val rel = 1e-3 + dim * 2.4e-7
          val abs = 1e-6 + dim * 2.4e-7
          // cosine: norms cached per query / per row — prefilter is 1 dot
          val qn =
            if (cosine) qarr.map(q => math.sqrt(graft.index.Simd.dot(q._2, q._2)))
            else null
          while (it.hasNext) {
            val (id, vec) = it.next()
            val nb = if (cosine) math.sqrt(graft.index.Simd.dot(vec, vec)) else 0.0
            var qi = 0
            while (qi < nq) {
              val q = qarr(qi)._2
              val dF =
                if (cosine) 1.0 - graft.index.Simd.dot(q, vec) / math.max(qn(qi) * nb, 1e-10)
                else graft.index.Simd.l2sq(q, vec)
              val n = sz(qi)
              val ds = bufD(qi); val ids = bufI(qi)
              val bound =
                if (n < k) Double.PositiveInfinity
                else ds(n - 1) + math.abs(ds(n - 1)) * rel + abs
              if (dF <= bound) {
                val d =
                  if (cosine) graft.index.Simd.cosineExact(q, vec)
                  else graft.index.Simd.l2sqExact(q, vec)
                if (n < k || d < ds(n - 1) || (d == ds(n - 1) && id < ids(n - 1))) {
                  val m = if (n < k) n else n - 1
                  // insertion position in (distance, id) order
                  var lo = 0; var hi = m
                  while (lo < hi) {
                    val mid = (lo + hi) >>> 1
                    if (d < ds(mid) || (d == ds(mid) && id < ids(mid))) hi = mid
                    else lo = mid + 1
                  }
                  System.arraycopy(ds, lo, ds, lo + 1, m - lo)
                  System.arraycopy(ids, lo, ids, lo + 1, m - lo)
                  ds(lo) = d; ids(lo) = id
                  if (n < k) sz(qi) = n + 1
                }
              }
              qi += 1
            }
          }
          Iterator.range(0, nq).flatMap { qi =>
            Iterator.range(0, sz(qi)).map(p => (qarr(qi)._1, bufI(qi)(p), bufD(qi)(p)))
          }
        }
      }
      .toDF("query_id", "id", "distance")
      .filter(col("distance") <= lit(upperBound))

    partial
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("id"), col("distance")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"), col("hit.distance").as("distance"))
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
