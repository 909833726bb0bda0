package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bq, CoarseMerge, Ivf, Sq}

/** Task-memory gate of the quantized coarse kernels: the query batch
  * chunks under `CoarseMerge.taskMaxBytes` (bounding each scan task's
  * nq × k × 16 B of TopBuffer slots — the nq10k × c20k OOM), and a
  * multi-chunk execution returns exactly the single-chunk rows on every
  * kernel (flat BQ, flat SQ, IVF-routed partitioned both). */
class CoarseChunkSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val base = Tables.vectors(spark, sf0001).select("id", "vec").cache()
  private lazy val qs = base.filter($"id" < 6)
    .select($"id".as("query_id"), $"vec".as("query_vec"))

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.select(col("query_id"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def withTaskBudget[T](bytes: Long)(body: => T): T = {
    val saved = CoarseMerge.taskMaxBytes
    try { CoarseMerge.taskMaxBytes = bytes; body }
    finally CoarseMerge.taskMaxBytes = saved
  }

  test("spans: balanced contiguous cover under the byte budget") {
    // default budget: one span
    assert(CoarseMerge.spans(1000, 2000) == Seq((0, 1000)))
    assert(CoarseMerge.spans(0, 10) == Seq((0, 0)))
    val saved = CoarseMerge.taskMaxBytes
    try {
      CoarseMerge.taskMaxBytes = 100L * 16L // 100 slot-queries at k=16... k*16 per q
      val s = CoarseMerge.spans(1000, 10) // perQ = 160 B -> maxQ = 10 -> 100 chunks
      assert(s.length == 100)
      assert(s.head._1 == 0 && s.last._2 == 1000)
      // contiguous, nonempty, each within budget
      s.sliding(2).foreach { case Seq((_, e1), (s2, _)) => assert(e1 == s2) }
      s.foreach { case (a, b) =>
        assert(b > a && (b - a).toLong * 10 * 16 <= CoarseMerge.taskMaxBytes)
      }
    } finally CoarseMerge.taskMaxBytes = saved
  }

  test("flat BQ hamming: multi-chunk == single-chunk (both merge and agg paths)") {
    val k = 300 // heap-layout budget, merge-eligible at nq=6
    val one = Bq.hammingBroadcast(base, qs, k = k)
      .orderBy("query_id", "hamming", "id").collect().toSeq
    assert(CoarseMerge.lastChunks == 1)
    val many = withTaskBudget(
        2L * k * graft.index.TopBuffer.slotBytes(k)) { // 2 q/chunk -> 3 chunks
      val r = Bq.hammingBroadcast(base, qs, k = k)
        .orderBy("query_id", "hamming", "id").collect().toSeq
      assert(CoarseMerge.lastChunks == 3, s"chunks=${CoarseMerge.lastChunks}")
      r
    }
    assert(many == one)
    // agg path too (merge gate shut): chunking is orthogonal to the merge gate
    val savedGate = CoarseMerge.maxBytes
    val aggMany = try {
      CoarseMerge.maxBytes = 1L
      withTaskBudget(2L * k * graft.index.TopBuffer.slotBytes(k)) {
        Bq.hammingBroadcast(base, qs, k = k)
          .orderBy("query_id", "hamming", "id").collect().toSeq
      }
    } finally CoarseMerge.maxBytes = savedGate
    assert(CoarseMerge.lastPath == "agg")
    assert(aggMany == one)
  }

  test("flat SQ coarse: multi-chunk == single-chunk") {
    val model = Sq.train(base)
    val packed = Sq.encode(base, model).select("id", "sq").cache()
    val one = Sq.serveBroadcastPacked(packed, qs, model, k = 7)
      .orderBy("query_id", "distance", "id").collect().toSeq
    assert(CoarseMerge.lastChunks == 1)
    val many = withTaskBudget(7L * 16L) { // 1 query per chunk -> 6 chunks
      val r = Sq.serveBroadcastPacked(packed, qs, model, k = 7)
        .orderBy("query_id", "distance", "id").collect().toSeq
      assert(CoarseMerge.lastChunks == 6, s"chunks=${CoarseMerge.lastChunks}")
      r
    }
    assert(many == one)
    packed.unpersist()
  }

  test("distributed merge (big-batch regime past the driver cap) == merge-path rows") {
    val k = 300 // heap layout; nq=6 × k=300 = 1800 winners
    val want = Bq.hammingBroadcast(base, qs, k = k)
      .orderBy("query_id", "hamming", "id").collect().toSeq
    assert(CoarseMerge.lastPath == "merge") // default gates: driver merge
    val savedRows = CoarseMerge.maxRows
    val dist = try {
      CoarseMerge.maxRows = 1L // below nq×k: driver-ineligible, dist-eligible
      val r = Bq.hammingBroadcast(base, qs, k = k)
        .orderBy("query_id", "hamming", "id").collect().toSeq
      assert(CoarseMerge.lastPath == "dist", s"path=${CoarseMerge.lastPath}")
      r
    } finally CoarseMerge.maxRows = savedRows
    assert(dist == want)
    // kill switch: dist disabled falls through to the aggregate path
    val savedFlag = CoarseMerge.distMerge
    val agg = try {
      CoarseMerge.maxRows = 1L
      CoarseMerge.distMerge = false
      val r = Bq.hammingBroadcast(base, qs, k = k)
        .orderBy("query_id", "hamming", "id").collect().toSeq
      assert(CoarseMerge.lastPath == "agg")
      r
    } finally {
      CoarseMerge.maxRows = savedRows
      CoarseMerge.distMerge = savedFlag
    }
    assert(agg == want)
    // SQ serving kernel through the dist path too (TopBuffer arrays cross a
    // real shuffle: local[4] serializes them between stages)
    val model = Sq.train(base)
    val packed = Sq.encode(base, model).select("id", "sq").cache()
    val sqWant = Sq.serveBroadcastPacked(packed, qs, model, k = 300)
      .orderBy("query_id", "distance", "id").collect().toSeq
    val sqDist = try {
      CoarseMerge.maxRows = 1L
      val r = Sq.serveBroadcastPacked(packed, qs, model, k = 300)
        .orderBy("query_id", "distance", "id").collect().toSeq
      assert(CoarseMerge.lastPath == "dist")
      r
    } finally CoarseMerge.maxRows = savedRows
    assert(sqDist == sqWant)
    packed.unpersist()
  }

  test("flat two-stage BQ + SQ: per-chunk rerank == single global rerank") {
    // r18: searchRerank* reranks each task-memory chunk's winners
    // separately and unions the reranked top-k — must be row-identical to
    // the unchunked execution (chunks partition the queries; both stages
    // are per-query)
    val cand = 24
    def full(d: org.apache.spark.sql.DataFrame) =
      d.select(col("query_id"), col("id"), col("distance"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bqOne = full(Bq.searchRerank(base, qs, k = 5, candidates = cand))
    assert(CoarseMerge.lastChunks == 1)
    val sqOne = full(Sq.searchRerank(base, qs, k = 5, candidates = cand))
    assert(CoarseMerge.lastChunks == 1)
    withTaskBudget(2L * cand * graft.index.TopBuffer.slotBytes(cand)) {
      val bqMany = full(Bq.searchRerank(base, qs, k = 5, candidates = cand))
      assert(CoarseMerge.lastChunks == 3, s"chunks=${CoarseMerge.lastChunks}")
      assert(bqMany == bqOne)
      val sqMany = full(Sq.searchRerank(base, qs, k = 5, candidates = cand))
      assert(CoarseMerge.lastChunks == 3)
      assert(sqMany == sqOne)
    }
  }

  test("merge path is LAZY: construction + planning run no treeReduce; rows unchanged; memoized") {
    val k = 300 // merge-eligible at nq=6 (k > HeapThreshold, under row/byte caps)
    val packed = Bq.encode(base).select("id", "bq").cache()
    packed.count()
    val qsArr = qs.select(col("query_id").cast("long"), col("query_vec"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, v) => (qid, graft.functions.BqKernel.pack(v)) }
    val before = CoarseMerge.mergeExecutions.get()
    // construction (pre-collected pre-packed batch: owes zero jobs)
    val df = Bq.hammingBroadcastPackedArr(packed, qsArr, k)
    assert(CoarseMerge.lastPath == "merge", s"path=${CoarseMerge.lastPath}")
    assert(CoarseMerge.mergeExecutions.get() == before,
      "treeReduce ran at DataFrame construction")
    // planning/explain must not execute either — the r17 wart was exactly
    // a .explain firing a corpus scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LazyLocalScan"), s"expected lazy scan node:\n$plan")
    assert(CoarseMerge.mergeExecutions.get() == before,
      "treeReduce ran at planning time")
    // first action materializes exactly once
    val got = df.orderBy("query_id", "hamming", "id").collect().toSeq
    assert(CoarseMerge.mergeExecutions.get() == before + 1)
    // a second action over the same DataFrame reuses the memoized merge
    assert(df.count() == got.size)
    assert(CoarseMerge.mergeExecutions.get() == before + 1,
      "merge re-ran on a second action")
    // rows identical to the aggregate path (merge gate shut)
    val savedGate = CoarseMerge.maxBytes
    val agg = try {
      CoarseMerge.maxBytes = 1L
      Bq.hammingBroadcastPackedArr(packed, qsArr, k)
        .orderBy("query_id", "hamming", "id").collect().toSeq
    } finally CoarseMerge.maxBytes = savedGate
    assert(CoarseMerge.lastPath == "agg")
    assert(got == agg)
    packed.unpersist()
  }

  test("lazy scan materializes in doPrepare — a slow thunk beats broadcastTimeout") {
    // r19 ADVICE: the deferred merge used to run INSIDE the consumer's
    // BroadcastExchange relation future, so spark.sql.broadcastTimeout
    // capped the whole coarse scan. LazyLocalScanExec.doPrepare now runs
    // the thunk on the main driver thread BEFORE the exchange's future
    // exists (children prepare first), so a scan slower than the timeout
    // still broadcasts. Regression shape: thunk sleeps past a 1 s
    // timeout; the broadcast-join collect must succeed.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType, nullable = false)))
    val thunk = () => {
      Thread.sleep(1800)
      Array.tabulate(3)(i => InternalRow(i.toLong): InternalRow)
    }
    val lazyDf = graft.plans.LazyLocal.ofThunk(spark, schema, thunk, 48L)
    val other = spark.range(3).select(col("id"))
    val saved = spark.conf.getOption("spark.sql.broadcastTimeout")
    try {
      spark.conf.set("spark.sql.broadcastTimeout", "1")
      val joined = other.join(broadcast(lazyDf), "id").collect()
      assert(joined.length == 3)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.broadcastTimeout", v)
      case None => spark.conf.unset("spark.sql.broadcastTimeout")
    }
  }

  test("IVF-routed SQ + BQ over the partitioned layout: multi-chunk == single-chunk, still pruned") {
    val (ivfModel, assigned) = Ivf.build(base.select(col("id"), col("vec")), k = 8)
    val sqModel = Sq.train(base)
    val sqPacked = Sq.encode(assigned, sqModel).select("id", "sq", "cluster")
    val bqModel = Bq.train(base)
    val bqPacked = Bq.encodeCentered(assigned, bqModel)
      .select(col("id"), col("bq"), col("cluster"))
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "chunk_ivf").toString
    Sq.writeIvfPartitioned(sqPacked, s"$dir/sq")
    Bq.writeIvfPartitioned(bqPacked, s"$dir/bq")
    val floatDir = s"$dir/float"
    Ivf.writePartitioned(assigned, ivfModel, floatDir)
    val floats = spark.read.parquet(s"$floatDir/data")
    def sqSearch() = Sq.searchIvfPartitioned(s"$dir/sq", floats, ivfModel,
      sqModel, qs, k = 5, candidates = 24, nProbes = Some(3),
      baseClusterCol = Some("cluster"))
    def bqSearch() = Bq.searchIvfPartitioned(s"$dir/bq", floats, ivfModel,
      Some(bqModel), qs, k = 5, candidates = 24, nProbes = Some(3),
      baseClusterCol = Some("cluster"))
    val sqOne = rows(sqSearch()); assert(CoarseMerge.lastChunks == 1)
    val bqOne = rows(bqSearch()); assert(CoarseMerge.lastChunks == 1)
    withTaskBudget(2L * 24L * 16L) { // 2 queries per chunk -> 3 chunks
      val sqManyDf = sqSearch()
      assert(CoarseMerge.lastChunks == 3, s"chunks=${CoarseMerge.lastChunks}")
      // per-chunk probe plans still reach the parquet scans as partition
      // filters (chunking must tighten pruning, not drop it)
      val plan = sqManyDf.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[cluster".r.findAllMatchIn(plan).size >= 2,
        s"expected partition filters on chunked scans:\n$plan")
      assert(rows(sqManyDf) == sqOne)
      val bqManyDf = bqSearch()
      assert(CoarseMerge.lastChunks == 3)
      assert(rows(bqManyDf) == bqOne)
    }
  }
}
