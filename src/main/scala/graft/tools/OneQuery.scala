package graft.tools

import org.apache.spark.sql.SparkSession

/** Run a single SparkEntry query and dump it to parquet — local iteration
  * on one graded query without paying the full Verify sweep. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    // the query's oracle SQL (if declared) beside it, for a DuckDB diff
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.oracle.sql"), sql)
    }
    println(s"[onequery] $name done")
    spark.stop()
  }
}
