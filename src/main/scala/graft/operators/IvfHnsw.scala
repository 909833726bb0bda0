package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.HnswGraph

/** IVF-routed HNSW — the composition that actually scales ANN serving past
  * one machine's memory. Neither parent structure alone survives 100 TB:
  * the reference's single HNSW graph (`/root/reference/src/index_algorithm/
  * hnsw_index.rs`) must fit in one process, and an UNROUTED subgraph union
  * ([[Hnsw.searchPinned]]) pays P graph walks per query — total work grows
  * linearly with the partition count, i.e. with table size. Routing fixes
  * the latter: partition the table by k-means cluster (the reference's own
  * IVF construction, `ivf_index.rs:64-107`), build one HNSW graph *per
  * cluster*, and walk only the `n_probes` clusters nearest each query —
  * per-query work is n_probes graph walks regardless of how many
  * partitions the table spans. This is the standard coarse-quantizer +
  * per-cell-graph design of the public ANN literature (FAISS's IVF+HNSW,
  * SPANN's cluster-and-route); recall is bounded by the same routing
  * quality as plain IVF probes (`ivf_index.rs:137-155`) — full probes
  * degenerate to the exact union, which is the oracle-gradable config.
  *
  * Index schema matches [[Hnsw.buildIndex]] (`pid` = cluster id), so the
  * sidecar persists/pins identically; search reuses
  * [[Hnsw.pinnedSearchCore]] with a per-query probe list.
  */
object IvfHnsw {

  /** Build: k-means route ([[Ivf.train]]) + one HNSW subgraph per cluster.
    * One shuffle of the base by cluster; each cluster's graph builds inside
    * a single task (clusters are the serving unit, sized by `kClusters` —
    * aim for ≲500k rows per cluster).
    *
    * Skew cap: a heavily skewed cluster would make its graph build a
    * single straggler task (the classic IVF imbalance — at 100 TB one hot
    * cluster could hold hours of single-threaded insert work). Clusters
    * past `maxGraphRows` are therefore SPLIT hierarchically before the
    * build: a local k-means over a bounded sample of the hot cluster
    * yields ceil(rows/cap) sub-centroids, which REPLACE the oversized
    * centroid in the routing model (the final model is a plain IVF model
    * with more, better-balanced cells — routing, probing, and the
    * pid-=-cluster sidecar contract are unchanged). Pathological input
    * (one exact duplicate repeated past the cap) still degenerates to one
    * cell — sub-centroids coincide and ties go to the lowest id.
    *
    * @return (routing model, index rows (pid=cluster, local_id, id, vec,
    *         level, links))
    */
  def buildIndex(
      base: DataFrame,
      kClusters: Int,
      dist: String = "l2sqr",
      m: Int = 16,
      efConstruction: Int = 200,
      seed: Long = 42L,
      trainFraction: Option[Double] = None,
      defaultNProbes: Int = 4,
      maxGraphRows: Long = 500000L): (IvfModel, DataFrame) = {
    val spark = base.sparkSession
    import spark.implicits._
    val src = base.select(col("id"), col("vec"))
    val (model0, assigned0) = Ivf.build(src, kClusters, dist, seed = seed,
      trainFraction = trainFraction)
    val counts = assigned0.groupBy("cluster").count().collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val over = counts.filter(_._2 > maxGraphRows)
    val (model, assigned) =
      if (over.isEmpty) (model0.copy(defaultNProbes = defaultNProbes), assigned0)
      else {
        val subCents: Map[Int, Array[Array[Float]]] = over.map { case (c, n) =>
          val shards = ((n + maxGraphRows - 1) / maxGraphRows).toInt
          // bounded deterministic sample of the hot cell (same spirit as
          // Ivf.train's k_means_size sampling)
          val sample = assigned0.filter(col("cluster") === c)
            .select("vec").limit(20000).collect()
            .map(_.getSeq[Float](0).toArray)
          val cents =
            if (sample.length <= shards) sample
            else graft.index.LocalKMeans.fit(sample, shards, dist,
              maxIter = 10, tol = 1e-4, seed = seed + c)
          c -> cents
        }.toMap
        val cents = model0.centroids.indices.flatMap { i =>
          subCents.getOrElse(i, Array(model0.centroids(i))).toSeq
        }.toArray
        val m2 = IvfModel(cents, dist, defaultNProbes)
        (m2, Ivf.assign(src, m2))
      }
    val idx = assigned
      .select(col("cluster").cast("int"), col("id").cast("long"), col("vec"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (cl, it) =>
        val rows = it.toArray
        val g = new HnswGraph(rows(0)._3.length, dist, m, efConstruction,
          seed + cl)
        rows.foreach(r => g.add(r._3))
        Iterator.range(0, rows.length).map { i =>
          val (vec, level, links) = g.exportNode(i)
          (cl, i, rows(i)._2, vec, level, links)
        }
      }
      .toDF("pid", "local_id", "id", "vec", "level", "links")
    (model, idx)
  }

  /** Routed batch search over a pinned index: probe lists are selected
    * driver-side against the centroid sidecar (exact distances, ties →
    * lowest cluster — identical to [[Ivf.searchPartitioned]]), then each
    * pinned partition walks only the graphs its queries probed.
    * Steady-state per-batch cost: Q × n_probes graph walks + the top-k
    * merge — independent of the total partition count.
    *
    * @param nProbes the reference's IVF `ef` (`ivf_index.rs:137-143`);
    *                None → model default. `kClusters` probes = exact union
    *                of per-cluster walks (gradable against the flat oracle
    *                when `ef` covers the clusters).
    */
  def searchPinned(
      index: DataFrame,
      model: IvfModel,
      queries: DataFrame,
      k: Int,
      ef: Option[Int] = None,
      nProbes: Option[Int] = None,
      m: Int = 16,
      efConstruction: Int = 200,
      upperBound: Double = Double.PositiveInfinity,
      cacheKey: Option[String] = None): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val np = math.max(1, nProbes.getOrElse(model.defaultNProbes))
    val qs = queries
      .select(col("query_id").cast("long"), col("query_vec"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, qv) => (qid, qv, Ivf.probeList(qv, model, np)) }
    Hnsw.pinnedSearchCore(index, qs, k,
      ef.getOrElse(math.max(efConstruction, 2 * m) / 2),
      model.dist, m, efConstruction, upperBound, cacheKey,
      routeFloor = model.centroids.length)
  }

  /** [[searchPinned]] with the ADC-scored walk + exact re-rank (`knn_pq`)
    * inside each probed cluster — routing bounds the number of walks,
    * codes bound the bytes each walk touches: the composition matching the
    * reference's fastest published configuration (HNSW+PQ,
    * `/root/reference/data/t_bench.toml:29-55`) past one machine's memory.
    * `pqModel` must be trained on the same table the index was built on.
    *
    * L2 tables encode RESIDUALS x − centroid(cluster) (FAISS's IVFPQ
    * design — `Hnsw.codeMatricesFor`): the shift is exact for L2, the
    * quantizer's resolution all goes to within-cell spread, and measured
    * walk recall at fixed (m, ef) rises accordingly (IvfHnswSpec). Cosine
    * encodes plain (a shift changes cosine distances). */
  def searchPinnedPq(
      index: DataFrame,
      model: IvfModel,
      pqModel: PqModel,
      queries: DataFrame,
      k: Int,
      ef: Option[Int] = None,
      nProbes: Option[Int] = None,
      m: Int = 16,
      efConstruction: Int = 200,
      upperBound: Double = Double.PositiveInfinity,
      cacheKey: Option[String] = None): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val np = math.max(1, nProbes.getOrElse(model.defaultNProbes))
    val qs = queries
      .select(col("query_id").cast("long"), col("query_vec"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, qv) => (qid, qv, Ivf.probeList(qv, model, np)) }
    Hnsw.pinnedSearchCore(index, qs, k,
      ef.getOrElse(math.max(efConstruction, 2 * m) / 2),
      pqModel.dist, m, efConstruction, upperBound, cacheKey, Some(pqModel),
      routeFloor = model.centroids.length,
      residCents = if (pqModel.residual) model.centroids else null)
  }

  /** Train a product quantizer on IVF RESIDUALS x − centroid(cluster(x)) —
    * FAISS's IVFPQ/IVFADC design, the quality complement of the routed ADC
    * walk: a plain-trained quantizer spends its per-group resolution
    * re-describing which cell a vector sits in (information routing
    * already paid for), while the residual-trained one spends all of it on
    * the within-cell spread that actually ranks neighbors. L2 only — the
    * per-cluster shift is a distance identity for L2 and meaningless for
    * cosine. The returned model is flagged `residual`; cluster-blind arms
    * reject it, [[searchPinnedPq]] encodes and shifts per probed cluster. */
  def trainResidualPq(
      base: DataFrame,
      model: IvfModel,
      m: Int,
      nBits: Int = 4,
      maxIter: Int = 20,
      tol: Double = 1e-6,
      seed: Long = 42L,
      trainFraction: Option[Double] = None): PqModel = {
    require(model.dist != "cosine",
      "residual PQ is an L2 shift identity; train a plain model for cosine")
    val spark = base.sparkSession
    import spark.implicits._
    val sampled = trainFraction.map(f => base.sample(f, seed)).getOrElse(base)
    val cents = spark.sparkContext.broadcast(model.centroids)
    val resid = Ivf.assign(sampled.select(col("vec")), model)
      .select(col("vec"), col("cluster").cast("int"))
      .as[(Array[Float], Int)]
      .map { case (v, c) =>
        val cent = cents.value(c)
        var j = 0
        while (j < v.length) { v(j) -= cent(j); j += 1 }
        v // Dataset decode hands each row a fresh array
      }
      .toDF("vec")
    Pq.train(resid, m, nBits, model.dist, maxIter, tol, seed)
      .copy(residual = true)
  }
}
