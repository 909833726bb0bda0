package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

import graft.functions.{BitPackSign, BqKernel, HammingDistance, VectorFunctions}

/** Binary-quantization (sign-bit) search — the codebook-free end of the
  * quantized-serving spectrum the reference's PQ occupies
  * (`/root/reference/src/distance/pq_table.rs`): 1 bit/dim packed into
  * longs (d960 → 15 words, 32× less scan traffic than float), Hamming
  * distance as the coarse score, exact re-rank on the survivors.
  *
  * 100 TB shape: the packed column is what scans — a 100 TB float corpus
  * is a ~3 TB packed corpus, streamed once per query batch with only
  * O(queries × candidates) rows ever shuffled. Re-ranking is one more
  * pass of the float corpus pruned by a broadcast hash join against the
  * (nq × candidates)-bounded winner set — never an all-pairs join.
  */
object Bq {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnShim.column(e)

  /** Column function: pack sign bits of `vec` into `array<bigint>`. */
  def bqPack(vec: Column): Column = c(BitPackSign(ColumnShim.expression(vec)))

  /** Column function: Hamming distance between two packed arrays. */
  def bqHamming(a: Column, b: Column): Column =
    c(HammingDistance(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Add a packed sign-bit column (default name `bq`). */
  def encode(df: DataFrame, vecCol: String = "vec", out: String = "bq"): DataFrame =
    df.withColumn(out, bqPack(col(vecCol)))

  /** Declarative Hamming top-k: encode both sides, broadcast the query
    * batch, codegen'd XOR/popcount score, bounded top-k aggregate. Ties
    * broken (hamming, id) ascending — the engine's standard order.
    * Output: (query_id, id, hamming: long).
    */
  def hammingTopK(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val packed = base.select(col(idCol).cast("long").as("__id"),
      bqPack(col(vecCol)).as("__bq"))
    val qs = broadcast(queries.select(
      col(queryIdCol).cast("long").as("query_id"),
      bqPack(col(queryVecCol)).as("__qbq")))
    packed.crossJoin(qs)
      .select(col("query_id"), col("__id"),
        bqHamming(col("__bq"), col("__qbq")).cast("double").as("__dist"))
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("__id"), col("__dist")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"),
        col("hit.distance").cast("long").as("hamming"))
  }

  /** Serving-shape Hamming top-k: broadcast the packed query batch, stream
    * the base once through `mapPartitions` with per-query bounded insertion
    * buffers on exact (hamming, id) order, merge the tiny partials with the
    * bounded aggregate — [[Knn.exactBroadcast]]'s shape on packed words
    * (integer XOR/popcount needs no float-error envelope: selection is
    * exact by construction). Same logical result as [[hammingTopK]].
    */
  def hammingBroadcast(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame =
    hammingBroadcastPacked(
      encode(base.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec")))
        .select(col("id"), col("bq")),
      queries, k, queryIdCol, queryVecCol)

  /** [[hammingBroadcast]] over an ALREADY-PACKED `(id, bq: array<bigint>)`
    * corpus — the deployed shape: the packed column is built once at ingest
    * (32× smaller than the float corpus) and is all that scans per batch. */
  def hammingBroadcastPacked(
      packed: DataFrame,
      queries: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, v) => (qid, BqKernel.pack(v)) }
    val bc = spark.sparkContext.broadcast(qs)

    val partial = packed
      .select(col("id").cast("long"), col("bq"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val qarr = bc.value
        val nq = qarr.length
        if (nq == 0 || !it.hasNext) Iterator.empty
        else {
          val bufH = Array.fill(nq)(new Array[Int](k))
          val bufI = Array.fill(nq)(new Array[Long](k))
          val sz = new Array[Int](nq)
          while (it.hasNext) {
            val (id, bq) = it.next()
            var qi = 0
            while (qi < nq) {
              val h = BqKernel.hamming(qarr(qi)._2, bq)
              val n = sz(qi)
              val hs = bufH(qi); val ids = bufI(qi)
              if (n < k || h < hs(n - 1) || (h == hs(n - 1) && id < ids(n - 1))) {
                val m = if (n < k) n else n - 1
                var lo = 0; var hi = m
                while (lo < hi) {
                  val mid = (lo + hi) >>> 1
                  if (h < hs(mid) || (h == hs(mid) && id < ids(mid))) hi = mid
                  else lo = mid + 1
                }
                System.arraycopy(hs, lo, hs, lo + 1, m - lo)
                System.arraycopy(ids, lo, ids, lo + 1, m - lo)
                hs(lo) = h; ids(lo) = id
                if (n < k) sz(qi) = n + 1
              }
              qi += 1
            }
          }
          Iterator.range(0, nq).flatMap { qi =>
            Iterator.range(0, sz(qi)).map(p =>
              (qarr(qi)._1, bufI(qi)(p), bufH(qi)(p).toDouble))
          }
        }
      }
      .toDF("query_id", "id", "distance")

    partial
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("id"), col("distance")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"),
        col("hit.distance").cast("long").as("hamming"))
  }

  /** Two-stage BQ serving: Hamming top-`candidates` coarse pass on the
    * packed column, exact `dist` re-rank of the survivors on one more
    * (id-pruned) pass over the float column. Output: (query_id, id,
    * distance) ascending (distance, id) per query — the engine's standard
    * KNN result shape, approximate with recall governed by
    * `candidates / k`.
    */
  def searchRerank(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      candidates: Int,
      dist: String = "l2sqr",
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame =
    searchRerankPacked(
      encode(base.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec")))
        .select(col("id"), col("bq")),
      base, queries, k, candidates, dist, idCol, vecCol, queryIdCol, queryVecCol)

  /** [[searchRerank]] with the coarse pass over an ALREADY-PACKED corpus
    * (see [[hammingBroadcastPacked]]). */
  def searchRerankPacked(
      packed: DataFrame,
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      candidates: Int,
      dist: String = "l2sqr",
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val coarse = hammingBroadcastPacked(packed, queries, candidates,
      queryIdCol, queryVecCol)
      .select(col("query_id"), col("id"))
    // one id-pruned pass over the float column: broadcast the (small)
    // candidate set against the base scan, attach each candidate's query
    // vector, score exactly, bounded top-k
    val qs = broadcast(queries.select(
      col(queryIdCol).cast("long").as("query_id"),
      col(queryVecCol).as("__qvec")))
    broadcast(coarse)
      .join(base.select(col(idCol).cast("long").as("id"), col(vecCol).as("__vec")), "id")
      .join(qs, "query_id")
      .select(col("query_id"), col("id"),
        VectorFunctions.distance(col("__vec"), col("__qvec"), dist).as("__dist"))
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("id"), col("__dist")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"),
        col("hit.distance").as("distance"))
  }
}
