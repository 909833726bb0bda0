package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** embeddings(vec_id: long, embedding: array<float>, label: int) as the
    * engine's canonical vector table (id, vec) — FIXTURES.md §1. */
  def vectors(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    t(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"),
        col("label"))
  }

  /** The canonical metadata-bearing vector table
    * `(id: long, vec: array<float>, meta: map<string,string>)` — the Spark
    * shape of the reference's `MetadataVecTable`
    * (`/root/reference/src/database/metadata_vec_table.rs:14-20`). Metadata
    * is synthesized deterministically from driver columns so the DuckDB
    * oracle can rebuild it: label (as string) + id parity. */
  def vectorsMeta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    vectors(spark, dir).select(
      col("id"), col("vec"),
      map(
        lit("label"), col("label").cast("string"),
        lit("parity"), when(col("id") % 2 === 0, "even").otherwise("odd")
      ).as("meta"))
  }

  /** documents(doc_id, text, lang, source, n_chars) — the LLM-pipeline
    * corpus table. */
  def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
}
