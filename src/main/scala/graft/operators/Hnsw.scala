package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.HnswGraph

/** Distributed HNSW: partitioned-subgraph design (SURVEY §7.2.5). Each
  * partition builds an independent HNSW graph over its rows inside one task
  * and beam-searches every (broadcast) query; per-partition top-k merge via
  * the bounded [[TopK]] aggregate. The reference's single sequential graph
  * (`/root/reference/src/index_algorithm/hnsw_index.rs`) cannot be mutated
  * concurrently across executors — the subgraph union sidesteps the
  * sequential bidirectional-link mutation entirely, and recall can only
  * improve over one big graph: the global top-k rows live in *some*
  * partition, and each partition's search covers its own rows.
  *
  * Scale shape: base streams once (no shuffle before the Q·partitions·k
  * merge); build cost is per-task and in-memory. A 100 TB table at 128 MB
  * splits gives ~500k-row subgraphs — well inside the single-graph regime
  * the reference itself targets.
  */
object Hnsw {

  /** Batch HNSW KNN search, building per-partition subgraphs on the fly.
    *
    * @param ef search beam width; None → reference default ef_construction/2
    * @return (query_id, id, distance) ascending (distance, id) per query
    */
  def search(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      ef: Option[Int] = None,
      dist: String = "l2sqr",
      m: Int = 16,
      efConstruction: Int = 200,
      seed: Long = 42L,
      upperBound: Double = Double.PositiveInfinity): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col("query_id").cast("long"), col("query_vec"))
      .as[(Long, Array[Float])].collect()
    val bc = spark.sparkContext.broadcast(qs)
    // normalized default_ef = max(efConstruction, 2m)/2 (hnsw_index.rs:495-506)
    val efq = ef.getOrElse(math.max(efConstruction, 2 * m) / 2)

    val partial = base
      .select(col("id").cast("long"), col("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val pid = TaskContext.getPartitionId()
          val g = new HnswGraph(rows(0)._2.length, dist, m, efConstruction,
            seed + pid)
          rows.foreach(r => g.add(r._2))
          bc.value.iterator.flatMap { case (qid, qv) =>
            g.search(qv, k, efq).iterator.map { case (local, d) =>
              (qid, rows(local)._1, d)
            }
          }
        }
      }
      .toDF("query_id", "id", "distance")
      .filter(col("distance") <= lit(upperBound))

    partial
      .groupBy("query_id")
      .agg(TopK.topK(k)(col("id"), col("distance")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"),
        col("hit.distance").as("distance"))
  }
}
