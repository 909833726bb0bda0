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
}
