package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Knn}

/** IVF invariants — ports the reference's IVF-vs-Flat oracle test
  * (`/root/reference/src/index_algorithm/ivf_index.rs:166-235`, equality
  * assert at `225-229`): probing every cluster must reproduce the exact Flat
  * result; default probes must keep the self-hit and ascending order. */
class IvfSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val base = Tables.vectors(spark, sf0001).select("id", "vec").cache()
  private lazy val queries = base.filter($"id" < 5)
    .select($"id".as("query_id"), $"vec".as("query_vec")).cache()
  private lazy val built = Ivf.build(base, k = 7, seed = 42L)

  test("probing all clusters equals Flat exact KNN (L2)") {
    val (model, assigned) = built
    val ivf = Ivf.search(assigned, model, queries, k = 6, nProbes = Some(7))
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val flat = Knn.exact(base, queries, k = 6)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(ivf == flat)
  }

  test("probing all clusters equals Flat exact KNN (cosine)") {
    val (model, assigned) = Ivf.build(base, k = 5, dist = "cosine", seed = 42L)
    val ivf = Ivf.search(assigned, model, queries, k = 4, nProbes = Some(5))
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val flat = Knn.exact(base, queries, k = 4, dist = "cosine")
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(ivf == flat)
  }

  test("default probes (4): self-hit first, ascending, k rows per query") {
    val (model, assigned) = built
    val hits = Ivf.search(assigned, model, queries, k = 6)
    assert(hits.groupBy("query_id").count()
      .filter($"count" =!= 6).count() == 0)
    val self = hits.filter($"query_id" === $"id")
    assert(self.count() == 5) // each query's own row is in its probed cluster
    assert(self.filter($"distance" > 1e-6).count() == 0)
    val perQuery = hits.orderBy("query_id", "distance", "id")
      .select("query_id", "distance").as[(Long, Double)].collect()
    perQuery.groupBy(_._1).values.foreach { g =>
      val ds = g.map(_._2)
      assert(ds.sameElements(ds.sorted))
    }
  }

  test("default probes achieve high recall vs Flat") {
    val (model, assigned) = built
    val ivf = Ivf.search(assigned, model, queries, k = 10)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val flat = Knn.exact(base, queries, k = 10)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(flat).size.toDouble / flat.size
    assert(recall >= 0.5, s"recall $recall too low for 4/7 probes")
  }

  test("histogram covers every row exactly once, clusters in [0, k)") {
    val (model, assigned) = built
    val hist = Ivf.histogram(assigned).collect()
    assert(hist.map(_.getAs[Long]("cnt")).sum == base.count())
    assert(hist.forall { r =>
      val c = r.getAs[Int]("cluster"); c >= 0 && c < model.centroids.length
    })
  }

  test("partitioned layout: searchPartitioned equals search; the scan partition-prunes") {
    val (model, assigned) = built
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ivf_part").toString
    Ivf.writePartitioned(assigned, model, dir)
    // centroid sidecar round-trips
    val reloaded = Ivf.readModel(spark, dir, model.dist)
    assert(reloaded.centroids.length == model.centroids.length)
    assert(reloaded.centroids.zip(model.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    for (np <- Seq(2, 7)) {
      val part = Ivf.searchPartitioned(dir, reloaded, queries, k = 6,
        nProbes = Some(np))
      val plain = Ivf.search(assigned, model, queries, k = 6, nProbes = Some(np))
        .select("query_id", "id", "distance").as[(Long, Long, Double)]
        .collect().toSet
      assert(part.select("query_id", "id", "distance")
        .as[(Long, Long, Double)].collect().toSet == plain, s"np=$np")
      // the probe scan must carry partition filters on `cluster` — the
      // physical pruning IVF exists for
      if (np < model.centroids.length) {
        val plan = part.queryExecution.executedPlan.toString
        assert(plan.contains("PartitionFilters: [cluster"),
          s"no partition filters in plan:\n$plan")
      }
    }
  }
}
