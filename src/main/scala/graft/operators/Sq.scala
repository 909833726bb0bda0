package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

import graft.functions.{SqAdcDistance, SqEncode, SqKernel}

/** SQ8 scalar-quantization search — 8 bits/dim under a per-dim affine map,
  * the middle point of the quantized-serving spectrum (BQ 1 bit → SQ8 →
  * PQ codebooks; the reference's codebook end is
  * `/root/reference/src/distance/pq_table.rs`). Unlike PQ there is no
  * learned codebook: the model is the exact per-dim (min, scale) pair, so
  * encoding is deterministic from the data and an independent SQL oracle
  * can recompute the codes bit-for-bit.
  *
  * 100 TB shape: train is ONE pass (per-partition fold + treeReduce of two
  * d-length arrays — no shuffle of data rows); the packed corpus is 1/4 the
  * float bytes and is all that scans per query batch; re-rank touches the
  * float column only through a broadcast-pruned `id IN` candidate set,
  * never an all-pairs join.
  */
object Sq {

  /** Exact per-dim affine model; `scales(i) == 0` marks a constant dim. */
  case class SqModel(mins: Array[Double], scales: Array[Double]) {
    def dim: Int = mins.length
  }

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnShim.column(e)

  /** One-pass exact per-dim min/max (double arithmetic; see [[SqKernel]]).
    * Per-partition fold keeps two d-length arrays per task; treeReduce
    * merges log₂(P) rounds of 2·d doubles — nothing else moves. */
  def train(df: DataFrame, vecCol: String = "vec"): SqModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df.select(col(vecCol)).as[Array[Float]].rdd
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val mn = first.map(_.toDouble)
          val mx = mn.clone()
          while (it.hasNext) {
            val v = it.next()
            require(v.length == mn.length,
              s"sq_train: dimension mismatch (${v.length} vs ${mn.length})")
            var i = 0
            while (i < v.length) {
              val x = v(i).toDouble
              if (x < mn(i)) mn(i) = x
              if (x > mx(i)) mx(i) = x
              i += 1
            }
          }
          Iterator.single((mn, mx))
        }
      }
    val (mins, maxs) = partials.treeReduce { case ((mn1, mx1), (mn2, mx2)) =>
      var i = 0
      while (i < mn1.length) {
        if (mn2(i) < mn1(i)) mn1(i) = mn2(i)
        if (mx2(i) > mx1(i)) mx1(i) = mx2(i)
        i += 1
      }
      (mn1, mx1)
    }
    SqModel(mins, SqKernel.scales(mins, maxs))
  }

  /** Column function: encode `vec` to a `dim`-byte binary code. */
  def sqEncode(vec: Column, model: SqModel): Column =
    c(SqEncode(ColumnShim.expression(vec), model.mins, model.scales))

  /** Column function: asymmetric distance (query floats vs decoded code). */
  def sqDistance(code: Column, query: Column, model: SqModel,
      dist: String = "l2sqr"): Column =
    c(SqAdcDistance(ColumnShim.expression(code), ColumnShim.expression(query),
      model.mins, model.scales, dist))

  /** Add an SQ8 code column (default name `sq`). */
  def encode(df: DataFrame, model: SqModel, vecCol: String = "vec",
      out: String = "sq"): DataFrame =
    df.withColumn(out, sqEncode(col(vecCol), model))

  /** Declarative coarse top-k on the quantized domain: broadcast the query
    * batch, codegen'd decode-and-score, bounded top-k aggregate. Ties
    * (distance, id) ascending. Output: (query_id, id, distance). */
  def coarseTopK(
      packed: DataFrame,
      queries: DataFrame,
      model: SqModel,
      k: Int,
      dist: String = "l2sqr",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val qs = broadcast(queries.select(
      col(queryIdCol).cast("long").as("query_id"),
      col(queryVecCol).as("__qvec")))
    packed.select(col("id").cast("long").as("__id"), col("sq"))
      .crossJoin(qs)
      .select(col("query_id"), col("__id"),
        sqDistance(col("sq"), col("__qvec"), model, dist).as("__dist"))
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("__id"), col("__dist")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"),
        col("hit.distance").as("distance"))
  }

  /** Serving-shape coarse top-k: broadcast the query batch, stream the
    * packed corpus once through `mapPartitions` with per-query bounded
    * insertion buffers, merge the tiny partials with the bounded aggregate
    * — [[Bq.hammingBroadcastPacked]]'s shape on SQ codes. Same logical
    * result as [[coarseTopK]]. */
  def serveBroadcastPacked(
      packed: DataFrame,
      queries: DataFrame,
      model: SqModel,
      k: Int,
      dist: String = "l2sqr",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol))
      .as[(Long, Array[Float])].collect()
    val bc = spark.sparkContext.broadcast(qs)
    val mins = model.mins
    val scales = model.scales
    val kindDot = dist == "dot"
    val kindCos = dist == "cosine"

    val partial = packed
      .select(col("id").cast("long"), col("sq"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val qarr = bc.value
        val nq = qarr.length
        if (nq == 0 || !it.hasNext) Iterator.empty
        else {
          val bufD = Array.fill(nq)(new Array[Double](k))
          val bufI = Array.fill(nq)(new Array[Long](k))
          val sz = new Array[Int](nq)
          while (it.hasNext) {
            val (id, code) = it.next()
            var qi = 0
            while (qi < nq) {
              val q = qarr(qi)._2
              val d =
                if (kindDot) SqKernel.dot(q, code, mins, scales)
                else if (kindCos) SqKernel.cosine(q, code, mins, scales)
                else SqKernel.l2(q, code, mins, scales)
              val n = sz(qi)
              val ds = bufD(qi); val ids = bufI(qi)
              if (n < k || d < ds(n - 1) || (d == ds(n - 1) && id < ids(n - 1))) {
                val m = if (n < k) n else n - 1
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
              qi += 1
            }
          }
          Iterator.range(0, nq).flatMap { qi =>
            Iterator.range(0, sz(qi)).map(p =>
              (qarr(qi)._1, bufI(qi)(p), bufD(qi)(p)))
          }
        }
      }
      .toDF("query_id", "id", "distance")

    partial
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("id"), col("distance")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"),
        col("hit.distance").as("distance"))
  }

  /** Two-stage SQ8 serving: coarse top-`candidates` on the packed column,
    * exact re-rank of the survivors on one id-pruned pass over the float
    * column ([[Bq.searchRerankPacked]]'s shape). Output: (query_id, id,
    * distance) ascending (distance, id) per query. With `candidates ≥ n`
    * the coarse pass keeps every row and the result is exact KNN. */
  def searchRerankPacked(
      packed: DataFrame,
      base: DataFrame,
      queries: DataFrame,
      model: SqModel,
      k: Int,
      candidates: Int,
      dist: String = "l2sqr",
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val coarse = serveBroadcastPacked(packed, queries, model, candidates,
      dist, queryIdCol, queryVecCol)
      .select(col("query_id"), col("id"))
    val qs = broadcast(queries.select(
      col(queryIdCol).cast("long").as("query_id"),
      col(queryVecCol).as("__qvec")))
    broadcast(coarse)
      .join(base.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("__vec")), "id")
      .join(qs, "query_id")
      .select(col("query_id"), col("id"),
        graft.functions.VectorFunctions.distance(
          col("__vec"), col("__qvec"), dist).as("__dist"))
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("id"), col("__dist")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"),
        col("hit.distance").as("distance"))
  }

  /** [[searchRerankPacked]] with train+encode inline (convenience for the
    * graded-query / test surface; deployments encode once at ingest). */
  def searchRerank(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      candidates: Int,
      dist: String = "l2sqr",
      idCol: String = "id",
      vecCol: String = "vec",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val model = train(base, vecCol)
    searchRerankPacked(
      encode(base.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("vec")), model).select(col("id"), col("sq")),
      base, queries, model, k, candidates, dist, idCol, vecCol,
      queryIdCol, queryVecCol)
  }
}
