package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for LLM training-data pipelines: document
  * chunking into overlapping token windows and deterministic hash-based
  * dataset splitting. Extensions beyond the reference (SURVEY §2
  * LLM-pipeline family; the reference serves vectors only — these are the
  * steps that produce what gets embedded and indexed).
  *
  * Both are map-only (zero shuffle): chunking is a per-row array
  * transformation followed by an explode, splitting is a per-row hash
  * comparison — embarrassingly parallel at 100 TB, entirely inside
  * whole-stage codegen (`functions._` only, no UDFs), and both replicated
  * 1:1 in the DuckDB oracle.
  */
object Corpus {

  /** Split documents into overlapping token windows — the standard
    * pre-embedding step (context-window packing, RAG chunking). A chunk
    * starts at every `stride` tokens while the start is inside the
    * document, and takes up to `window` tokens, so every token lands in
    * ≥1 chunk and the final chunk may be short. Tokens are the same
    * whitespace split every text operator here uses.
    *
    * Map-only: `sequence` mints the starts, `transform` + `slice` cut the
    * windows inside the row, one `explode` fans out — no shuffle, no UDF;
    * chunk ordinals are per-document (deterministic), not global.
    *
    * @return (doc_id, chunk_id, chunk_text, n_tokens) — chunk_id 0-based
    *         in document order
    */
  def chunk(docs: DataFrame, window: Int = 32, stride: Int = 24,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && stride >= 1, "chunk: window and stride must be >= 1")
    val toks = split(col(textCol), " ")
    docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("toks")) - 1, lit(stride)),
          start => slice(col("toks"), start + 1, lit(window)))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).as("n_tokens"))
  }

  /** Deterministic train/val/test assignment by content-free id hash — the
    * reproducible dataset split every training pipeline needs (the same
    * doc lands in the same split on any cluster, any partitioning, any
    * day; adding documents never reassigns existing ones, unlike
    * `randomSplit`). Assignment compares the first 4 hex chars of
    * `md5(salt:id)` — a fixed-width lowercase hex string, so lexicographic
    * comparison IS numeric comparison and the DuckDB oracle replicates it
    * with its own `md5` verbatim. 16-bit resolution bounds fraction
    * granularity at 1/65536 ≈ 0.0015%.
    *
    * @param fractions (name, fraction) in assignment order; must sum to ~1
    * @return input plus a `split` column
    */
  def hashSplit(df: DataFrame, fractions: Seq[(String, Double)],
      salt: String = "", idCol: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "hashSplit: fractions must sum to 1")
    val hex = substring(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 4)
    // cumulative 16-bit thresholds as 4-char hex strings; the last bucket
    // takes the remainder so rounding never leaves an unassigned row
    val cuts = fractions.init
      .scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(c => f"${math.round(c * 65536).toInt min 0xffff}%04x")
    val assign = fractions.init.zip(cuts)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cut)) =>
        Some(acc.fold(when(hex < cut, name))(_.when(hex < cut, name)))
      }
      .fold(lit(fractions.head._1))(_.otherwise(fractions.last._1))
    df.withColumn("split", assign)
  }
}
