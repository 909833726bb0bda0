package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents sharing word n-grams
  * with an evaluation/benchmark set — the GPT-3-style overlap check
  * (Brown et al. 2020, appendix C) every serious training pipeline runs
  * before training. Extension beyond the reference (SURVEY §2 LLM-pipeline
  * family).
  *
  * 100 TB shape: both sides reduce to DISTINCT 64-bit n-gram hashes via the
  * single-pass native [[graft.functions.NgramHashes]] expression (the same
  * kernel the MinHash/Jaccard dedup arms use), so the join moves longs,
  * never text. The benchmark side is tiny by nature (eval sets are MBs
  * against TBs of training data) and is broadcast — the corpus side never
  * shuffles at all: scan → hash → explode → broadcast-hash-join →
  * partial-agg. The corpus is touched exactly once.
  *
  * The DuckDB oracle replicates the semantics with literal n-gram strings
  * (two token windows are equal iff their space-joins are equal, since
  * tokens cannot contain the separator); 64-bit hashing is collision-safe
  * at any realistic corpus size (~10⁻⁸ collision odds at 10⁹ distinct
  * n-grams) and a collision would surface as an oracle hash mismatch.
  */
object Decontaminate {

  /** All (training doc, benchmark doc) pairs sharing ≥ `minShared` distinct
    * word n-grams, with the shared count. Self-pairs are kept when ids
    * collide across the two tables (callers drawing the benchmark from the
    * corpus itself filter `doc_id <> bench_id`).
    *
    * @return (doc_id, bench_id, n_shared)
    */
  def contaminationPairs(docs: DataFrame, bench: DataFrame, n: Int = 13,
      minShared: Int = 1, idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "doc_id", benchTextCol: String = "text"): DataFrame = {
    val dGrams = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(graft.functions.TextFunctions.ngramHashes(col(textCol), n)).as("g"))
    val bGrams = bench.select(col(benchIdCol).cast("long").as("bench_id"),
      explode(graft.functions.TextFunctions.ngramHashes(col(benchTextCol), n)).as("g"))
    dGrams.join(broadcast(bGrams), "g")
      .groupBy("doc_id", "bench_id")
      // NgramHashes emits DISTINCT hashes per document, so the join hits
      // each shared n-gram exactly once per pair — count(*) IS the distinct
      // shared-gram count, no count_distinct state needed
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The corpus with contaminated documents removed — the actual pipeline
    * step. A doc is contaminated iff it shares ≥ `minShared` n-grams with
    * ANY benchmark doc; the anti-join keys on doc_id only, so the pruned
    * result never carries benchmark attribution (use
    * [[contaminationPairs]] for the audit report). */
  def decontaminate(docs: DataFrame, bench: DataFrame, n: Int = 13,
      minShared: Int = 1, idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "doc_id", benchTextCol: String = "text"): DataFrame = {
    val dirty = contaminationPairs(docs, bench, n, minShared, idCol, textCol,
      benchIdCol, benchTextCol)
      .select(col("doc_id")).distinct()
    docs.join(dirty, docs(idCol).cast("long") === dirty("doc_id"), "left_anti")
  }
}
