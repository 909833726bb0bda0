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
  *  - The top-k aggregation carries only (id, distance); metadata is attached
  *    by broadcast-joining the Q×k winners back against a column-pruned
  *    (id, meta) scan. At 100 TB this means the expensive pass touches only
  *    the vector column, and no per-row metadata serialization happens for
  *    rows that lose the top-k race (the round-2 version paid `to_json` on
  *    100% of scanned rows to keep ~0.001%).
  *  - `ef` is accepted and ignored on the Flat path, matching
  *    `/root/reference/src/database/dynamic_index.rs:75-80`; index-aware
  *    dispatch lives in the catalog layer ([[graft.catalog.VecDB]]).
  */
object Search {

  /** P1 — conjunctive equality pattern over a `meta: map<string,string>`
    * column: row matches iff ∀(k,v)∈pattern: meta[k] == v. Null-safe
    * (`<=>`): a row missing the key is FALSE, not NULL, so the negated form
    * (delete-by-pattern survivors) keeps such rows — matching the
    * reference's `metadata.get(k) == Some(v)`
    * (`/root/reference/src/database/metadata_vec_table.rs:164-169`). */
  def metaPattern(pattern: Map[String, String], metaCol: Column): Column =
    pattern.map { case (k, v) => metaCol.getItem(k) <=> lit(v) }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Flat search over a `(id, vec, meta)` table for a batch of queries.
    *
    * @return (query_id, id, distance, meta) ascending (distance, id) per
    *         query; `meta` is the row's `map<string,string>` metadata column.
    */
  def flat(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      dist: String = "l2sqr",
      ef: Option[Int] = None,
      upperBound: Double = Double.PositiveInfinity,
      pattern: Map[String, String] = Map.empty): DataFrame = {
    val filtered = base.filter(metaPattern(pattern, col("meta")))
    val hits = Knn.exact(
      filtered, queries, k, dist, upperBound = upperBound)
    // attach metadata: winners are Q×k rows — broadcast them against a
    // column-pruned (id, meta) scan of the same filtered table
    filtered.select(col("id").cast("long").as("id"), col("meta"))
      .join(broadcast(hits), "id")
      .select(col("query_id"), col("id"), col("distance"), col("meta"))
  }
}
