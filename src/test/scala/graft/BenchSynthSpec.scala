package graft

import org.apache.spark.sql.functions._

/** The bench fixture generators were rewritten from interpreted
  * `transform(sequence(...), j -> ...xxhash64...)` expressions to
  * mapPartitions kernels calling the same XXH64 primitive (~30× cheaper
  * per uncached pass at 1M×960). Bit-identity with the original expression
  * forms is load-bearing: the cached `bench_cache/` indexes were built from
  * the expression-generated fixtures, and a changed fixture would silently
  * invalidate every cross-round bench comparison. This spec pins it. */
class BenchSynthSpec extends SparkTestBase {

  test("synthVectors kernel is bit-identical to the expression form") {
    val n = 500L
    val dim = 67 // odd, != any bench dim: no accidental-shape pass
    val expr = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => ((pmod(xxhash64(col("id"), j), lit(20000L)) - 10000L) / 10000.0)
          .cast("float")).as("vec"))
    val kern = Bench.synthVectors(spark, n, dim)
    val e = expr.orderBy("id").collect()
    val k = kern.orderBy("id").collect()
    assert(e.length == k.length)
    e.zip(k).foreach { case (re, rk) =>
      assert(re.getLong(0) == rk.getLong(0))
      assert(re.getSeq[Float](1) == rk.getSeq[Float](1),
        s"row ${re.getLong(0)} differs")
    }
  }

  test("synthClusteredVectors kernel is bit-identical to the expression form") {
    val n = 500L
    val dim = 67
    val centers = 13
    val noise = 0.3
    val expr = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (((pmod(xxhash64(col("id") % centers, j), lit(20000L)) - 10000L) / 10000.0) +
          ((pmod(xxhash64(col("id"), j + dim), lit(20000L)) - 10000L) / 10000.0) * noise)
          .cast("float")).as("vec"))
    val kern = Bench.synthClusteredVectors(spark, n, dim, centers, noise)
    val e = expr.orderBy("id").collect()
    val k = kern.orderBy("id").collect()
    assert(e.length == k.length)
    e.zip(k).foreach { case (re, rk) =>
      assert(re.getLong(0) == rk.getLong(0))
      assert(re.getSeq[Float](1) == rk.getSeq[Float](1),
        s"row ${re.getLong(0)} differs")
    }
  }
}
