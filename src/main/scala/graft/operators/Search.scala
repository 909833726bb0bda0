package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The flagship `search(key, query, k, ef, upper_bound)` read — the
  * reference's `MetadataVecTable::search`
  * (`/root/reference/src/database/metadata_vec_table.rs:194-212`):
  * conjunctive metadata pattern filter (P1, `match_metadata` at `164-169`),
  * KNN scoring, `distance <= upper_bound` post-filter (P3, `206-211`), and
  * metadata attached to every hit (J2, `210-211`), ascending (distance, id).
  *
  * Scale notes:
  *  - The pattern filter runs BEFORE scoring (predicate pushdown to the scan
  *    — an optimization the reference itself cannot do: it scores first and
  *    filters metadata per candidate).
  *  - Metadata rides through the top-k aggregation as a packed payload
  *    (TopKRows), so the table is scanned exactly once; no join-back pass
  *    over the metadata column.
  *  - `ef` is accepted and ignored on the Flat path, matching
  *    `/root/reference/src/database/dynamic_index.rs:75-80`; index-aware
  *    dispatch lives in the catalog layer (graft.catalog.VecDB).
  */
object Search {

  /** P1 — conjunctive equality pattern over a `meta: map<string,string>`
    * column: row matches iff ∀(k,v)∈pattern: meta[k] == v. */
  def metaPattern(pattern: Map[String, String], metaCol: Column): Column =
    pattern.map { case (k, v) => metaCol.getItem(k) === lit(v) }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Flat search over a `(id, vec, meta)` table for a batch of queries.
    *
    * @return (query_id, id, distance, meta) ascending (distance, id) per
    *         query; `meta` is the packed JSON string of the row's metadata.
    */
  def flat(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      dist: String = "l2sqr",
      ef: Option[Int] = None,
      upperBound: Double = Double.PositiveInfinity,
      pattern: Map[String, String] = Map.empty): DataFrame = {
    val filtered = base
      .filter(metaPattern(pattern, col("meta")))
      .select(col("id").cast("long").as("__id"), col("vec").as("__vec"),
        to_json(col("meta")).as("__meta"))
    val scored = filtered
      .crossJoin(broadcast(
        queries.select(col("query_id").cast("long").as("query_id"),
          col("query_vec").as("__qvec"))))
      .select(col("query_id"), col("__id"), col("__meta"),
        VectorFunctions.distance(col("__vec"), col("__qvec"), dist).as("__dist"))
      .filter(col("__dist") <= lit(upperBound))
    scored
      .groupBy("query_id")
      .agg(TopK.topKRows(k)(col("__id"), col("__dist"), col("__meta")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"),
        col("hit.distance").as("distance"), col("hit.payload").as("meta"))
  }
}
