package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.index.TopBuffer

/** Driver/tree-merged bounded selection for the quantized coarse passes,
  * plus the per-task memory gate (query-batch chunking) they share.
  *
  * The default merge of per-partition top-k partials is a row explosion:
  * every partition emits nq × k (query_id, id, distance) rows into a
  * shuffle + bounded aggregate — at nq=1000, candidates=2000, P=32 that is
  * 64M rows exchanged PER BATCH, and it (not the scan arithmetic) was the
  * measured bound of the two-stage 1M rerank arms. When the final winner
  * set fits comfortably on the driver (nq × k × 16 B under [[maxBytes]]),
  * `treeReduce` merges the per-partition [[TopBuffer]] arrays directly —
  * log₂(P) rounds of bounded-union [[TopBuffer.absorb]], no row shuffle,
  * no aggregate — and the winners materialize as a LocalRelation the
  * rerank join broadcasts without an extra job.
  *
  * Laziness: [[merge]] defers its `treeReduce` behind a
  * [[graft.plans.LazyLocalRelation]], so the public coarse entry points
  * (`Bq.hammingBroadcastPacked`, `Sq.serveBroadcastPacked`, the two-stage
  * searches) keep the DataFrame laziness contract — the coarse scan fires
  * at the consumer's first execution, never at construction or `.explain`.
  *
  * Selection is identical to the aggregate path: absorb re-offers every
  * element under the same strict (distance, id) admits, so a merge tree of
  * any shape lands on the exact global top-k (the serving==declarative
  * specs pin it).
  *
  * 100 TB shape: the gate is the same driver-memory argument as the rerank
  * broadcast gate — past it (huge batches × huge budgets) the aggregate
  * path remains, whose shuffle is distributed-safe just slower.
  */
private[graft] object CoarseMerge {

  /** Driver budget for the merged winner set (nq × k × 16 B estimate).
    * 128 MiB keeps the treeReduce's final collect (up to ~√P partial
    * arrays of this size) under Spark's default 1g driver.maxResultSize.
    * Override with `-Dgraft.coarse.merge.max.bytes` (volatile for tests;
    * toggle sequentially — it is process-wide). */
  @volatile var maxBytes: Long =
    sys.props.get("graft.coarse.merge.max.bytes").map(_.toLong)
      .getOrElse(128L << 20)

  /** EXECUTOR-TASK budget for the coarse kernels' per-task selection
    * state: every scanned partition holds nq × k × 16 B of [[TopBuffer]]
    * slots for the whole pass, so an ungated nq=10k × candidates=20k
    * batch allocates 3.2 GB PER TASK — an OOM at any executor size, and
    * the one scale exposure the rerank-join gate doesn't cover. The
    * kernels chunk the query batch to [[spans]] under this budget and
    * union the chunk results (selection is per-query, so chunking is
    * exact by construction; each chunk is one more pass over the pruned
    * scan — memory is bounded by trading passes). Override with
    * `-Dgraft.coarse.task.max.bytes`. */
  @volatile var taskMaxBytes: Long =
    sys.props.get("graft.coarse.task.max.bytes").map(_.toLong)
      .getOrElse(256L << 20)

  /** Path the last eligible-kernel call took on THIS thread ("merge" |
    * "agg") — observability for the specs; not public surface. Thread-
    * local: gate decisions happen at plan-construction time on the
    * calling thread, so concurrent searches (the bench's 4-wide sustained
    * pool) don't interleave writes. */
  private val lastPathTl: ThreadLocal[String] =
    ThreadLocal.withInitial(() => "")
  private[graft] def lastPath: String = lastPathTl.get()
  private[graft] def lastPath_=(v: String): Unit = lastPathTl.set(v)

  /** Coverage-aware dispatch threshold for the PARTITIONED quantized
    * layouts (r18, closing the r17 prune-void gap): when a chunk's probe
    * union covers at least this fraction of the clusters, directory
    * pruning is void — the batch reads (almost) every cluster directory
    * anyway, paying the partitioned layout's per-directory file/footer
    * overhead for nothing (measured at kc=32, nq=1000, np=1: coverage
    * 1.0 served 142.9 q/s partitioned vs 270.5 for the full-scan twin) —
    * so the dispatch serves the UNPARTITIONED flat sidecar instead when
    * the caller ships one. Pure physical routing: the same (id, code,
    * cluster) rows scan under the same per-query probe restriction, so
    * results are bit-identical. The probe union is driver-known BEFORE
    * any scan, so the decision costs nothing. Override with
    * `-Dgraft.coarse.coverage.flat.threshold` (volatile for specs);
    * > 1.0 disables. */
  @volatile var coverageFlatThreshold: Double =
    sys.props.get("graft.coarse.coverage.flat.threshold").map(_.toDouble)
      .getOrElse(0.5)

  /** Scan arm the last coverage-dispatched chunk took on THIS thread
    * ("partitioned" | "flat"; "" before any dispatched call) —
    * observability for the dispatch specs and the bench artifact. */
  private val lastCoverageArmTl: ThreadLocal[String] =
    ThreadLocal.withInitial(() => "")
  private[graft] def lastCoverageArm: String = lastCoverageArmTl.get()
  private[graft] def lastCoverageArm_=(v: String): Unit =
    lastCoverageArmTl.set(v)

  /** Number of times a deferred [[merge]] thunk has actually RUN its
    * treeReduce (process-wide) — observability for the laziness spec: a
    * constructed-but-unexecuted merge plan must not move this. */
  private[graft] val mergeExecutions = new java.util.concurrent.atomic.AtomicLong(0)

  /** Chunk count of the last kernel call on THIS thread — observability
    * for the task-memory-gate specs. */
  private val lastChunksTl: ThreadLocal[Integer] =
    ThreadLocal.withInitial(() => Integer.valueOf(1))
  private[graft] def lastChunks: Int = lastChunksTl.get().intValue
  private[graft] def lastChunks_=(v: Int): Unit =
    lastChunksTl.set(Integer.valueOf(v))

  /** Batch-size threshold for AUTO approximate coarse selection (r19,
    * verdict #2): the 660 q/s big-batch target is probe-proven
    * unreachable under EXACT selection — exactness requires every
    * partition's top-c per query to cross the merge (P × nq × c entries,
    * 640M ≈ 10 GB at nq=10k × c=2000 × P=32), and the reference's own
    * quantized arm is approximate anyway (ef-bounded,
    * `flat_index.rs:84-104`). In approximate mode each partition keeps
    * only top-⌈c/P⌉ per query and the union IS the rerank pool — no
    * selection shuffle at all; the exact rerank then computes true
    * distances over the pool, so result quality degrades only by
    * pool-membership (graded: recall ≥ floor + domination). Callers in
    * "auto" mode switch over at this many queries; small batches keep
    * exact selection bit-for-bit. Override with
    * `-Dgraft.coarse.approx.nq.threshold`; Int.MaxValue disables. */
  @volatile var approxNqThreshold: Int =
    sys.props.get("graft.coarse.approx.nq.threshold").map(_.toInt)
      .getOrElse(4096)

  /** Per-partition-cap multiplier for the approximate selection modes
    * (calibration dial for the `approx_budget_sweep` bench section and a
    * production knob): cap = max(k, ⌈mult × candidates/P⌉). 1.0 keeps the
    * pool ≈ nq × candidates; > 1 buys recall margin with per-task slots;
    * < 1 trades recall for state. Override with
    * `-Dgraft.coarse.approx.cap.mult` (volatile for the sweep — toggle
    * sequentially, it is process-wide). */
  @volatile var approxCapMult: Double =
    sys.props.get("graft.coarse.approx.cap.mult").map(_.toDouble)
      .getOrElse(1.0)

  /** Does `mode` resolve to approximate selection at this batch size?
    * `"approx"` always, `"auto"` at ≥ [[approxNqThreshold]] queries,
    * `"exact"` never; anything else is a caller bug. */
  private[graft] def approxActive(mode: String, nq: Int): Boolean =
    mode match {
      case "exact" => false
      case "approx" => true
      case "auto" => nq >= approxNqThreshold
      case other => throw new IllegalArgumentException(
        s"coarseSelect must be exact|approx|auto (got '$other')")
    }

  /** Per-partition buffer cap for an ACTIVE approximate selection over
    * `scan`: max(k, ⌈[[approxCapMult]] × candidates/P⌉) with P the scan's
    * actual partition count — the pool stays ≈ nq × candidates rows while
    * every partition can still surface a full final top-k on its own. */
  private[graft] def capFor(scan: DataFrame, k: Int, candidates: Int): Int = {
    val p = math.max(1, scan.rdd.getNumPartitions)
    math.max(k, math.ceil(approxCapMult * candidates / p).toInt)
  }

  /** Resolve a coarse-selection mode string to the per-partition buffer
    * cap the kernels take (0 = exact selection). `"approx"` forces it,
    * `"auto"` switches at [[approxNqThreshold]] queries, `"exact"` never.
    * Cap = max(k, ⌈candidates/P⌉): the pool stays ≈ nq × candidates rows
    * while every partition can still surface a full final top-k on its
    * own (a query whose true neighborhood is partition-concentrated
    * degrades to its partition's top-⌈c/P⌉ by sketch order — the graded
    * recall floor and the bench's in-artifact recall watch exactly
    * that). */
  private[graft] def approxPerPart(mode: String, nq: Int, packed: DataFrame,
      k: Int, candidates: Int): Int =
    if (!approxActive(mode, nq)) 0 else capFor(packed, k, candidates)

  /** Winner-ROW cap: past ~1M rows the driver materialization (building
    * and broadcasting an nq × k LocalRelation per batch) costs more than
    * the distributed aggregate it replaces — measured on the 1M BQ rerank
    * (nq=1000 × c=2000 = 2M winners: agg 106 q/s vs merge 79). Merge is
    * for SMALL-batch × large-budget serving, where the aggregate's
    * P × nq × k partial-row shuffle is pure overhead. Override with
    * `-Dgraft.coarse.merge.max.rows`. */
  @volatile var maxRows: Long =
    sys.props.get("graft.coarse.merge.max.rows").map(_.toLong)
      .getOrElse(1L << 20)

  /** Driver-merge pays only past the heap threshold — below it the partial
    * row volume is small and the aggregate path's shuffle is cheaper than
    * shipping P × nq buffer objects. */
  def eligible(nq: Int, k: Int): Boolean =
    k > TopBuffer.HeapThreshold && nq.toLong * k <= maxRows &&
      nq.toLong * k * 16L <= maxBytes

  /** Distributed-merge gate: the BIG-batch regime past the driver cap.
    * Above [[maxRows]] winners the driver merge would blow
    * driver.maxResultSize and the row-aggregate path shuffles
    * P × nq × k individual partial ROWS (640M records at nq=10k,
    * k=2000, P=32 — the measured bound of the nq10k proof row);
    * [[mergeDistributed]] ships the same information as P × shards
    * primitive-array records instead. Disable with
    * `-Dgraft.coarse.dist.merge=false` (volatile for the A/B bench). */
  @volatile var distMerge: Boolean =
    sys.props.get("graft.coarse.dist.merge").forall(_.toBoolean)
  def distEligible(nq: Int, k: Int): Boolean =
    distMerge && k > TopBuffer.HeapThreshold && nq.toLong * k > maxRows

  /** Contiguous, balanced query-index spans `[start, end)` such that each
    * chunk's per-task selection state (span × k × 16 B) fits
    * [[taskMaxBytes]]. One span (the whole batch) in the common case;
    * `(0, 0)` for an empty batch so callers always have a span to map. */
  def spans(nq: Int, k: Int): Seq[(Int, Int)] = {
    if (nq <= 0) return Seq((0, 0))
    val perQ = math.max(16L, k.toLong * TopBuffer.slotBytes(k))
    val maxQ = math.min(nq.toLong, math.max(1L, taskMaxBytes / perQ))
    val n = ((nq + maxQ - 1) / maxQ).toInt
    (0 until n).map(i =>
      ((i.toLong * nq / n).toInt, ((i + 1).toLong * nq / n).toInt))
  }

  private val outSchema = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("distance", DoubleType, nullable = false)))

  /** Distributed bounded merge for the big-batch regime: split each scan
    * partition's nq-length buffer array into `shards` contiguous
    * query-range shards, `reduceByKey` the shards with elementwise
    * [[TopBuffer.absorb]] (map-side combined — a reducer holds at most
    * two shard arrays at a time), and emit the merged winners per-query
    * ascending (distance, id). Selection is identical to both other
    * paths (absorb re-offers under the same strict admits).
    *
    * Shuffle shape vs the row-aggregate path: the SAME winner
    * information moves as P × shards primitive-array records instead of
    * P × nq × k row records — at nq=10k, k=2000, P=32 that is ~1k
    * records vs 640M, removing the per-record shuffle overhead that
    * bounded the nq10k proof row. Per-reducer memory is
    * (nq/shards) × k × 16 B, held under [[taskMaxBytes]] by the shard
    * count; parallelism stays at `defaultParallelism` when the byte
    * bound would allow fewer shards. 100 TB shape: every stage is
    * executor-distributed — nothing scales with nq × k on the driver. */
  def mergeDistributed(spark: SparkSession, qids: Array[Long],
      partials: RDD[Array[TopBuffer]], k: Int): DataFrame = {
    val nq = qids.length
    val byBytes = (nq.toLong * k * TopBuffer.slotBytes(k) + taskMaxBytes - 1) /
      taskMaxBytes
    val r = math.max(1L, math.min(nq.toLong,
      math.max(byBytes, spark.sparkContext.defaultParallelism.toLong))).toInt
    val sharded = partials.flatMap { bufs =>
      if (bufs.length == 0) Iterator.empty
      else Iterator.range(0, r).map { si =>
        val s = (si.toLong * bufs.length / r).toInt
        val e = ((si + 1).toLong * bufs.length / r).toInt
        (si, bufs.slice(s, e))
      }
    }
    val merged = sharded.reduceByKey(
      new org.apache.spark.HashPartitioner(r),
      (a: Array[TopBuffer], b: Array[TopBuffer]) => {
        var i = 0
        while (i < a.length) { a(i).absorb(b(i)); i += 1 }
        a
      })
    val bcQids = spark.sparkContext.broadcast(qids)
    val rows = merged.flatMap { case (si, bufs) =>
      val ids = bcQids.value
      val s = (si.toLong * ids.length / r).toInt
      bufs.iterator.zipWithIndex.flatMap { case (buf, off) =>
        val order = Array.range(0, buf.size).sortWith { (x, y) =>
          val dx = buf.distAt(x); val dy = buf.distAt(y)
          dx < dy || (dx == dy && buf.idAt(x) < buf.idAt(y))
        }
        order.iterator.map(p =>
          Row(ids(s + off), buf.idAt(p), buf.distAt(p)))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Tree-merge per-partition buffer arrays and materialize the winners as
    * a driver-local (query_id, id, distance) DataFrame, per-query ascending
    * (distance, id) — the same row order as the aggregate path's sorted
    * top-k materialization, so the physical gate never changes what a
    * row-order-sensitive consumer sees. `partials` emits ONE array per
    * partition: nq-length for a scanned partition, EMPTY for a row-less
    * one (so empty partitions cost no nq × k allocation).
    *
    * LAZY (r18, closing the r17 laziness wart): the treeReduce is deferred
    * behind a [[graft.plans.LazyLocalRelation]] — it runs at the
    * consumer's first EXECUTION, not at DataFrame construction, so the
    * public coarse entry points keep the DataFrame laziness contract
    * (`.explain` plans without scanning; an unexecuted plan costs
    * nothing). The broadcast economics are unchanged: the exec node's
    * `executeCollect` hands the merged rows to a BroadcastExchange with no
    * extra job, exactly as the old eager LocalRelation did. The merge runs
    * at most once per call (memoized) however many Datasets reuse it. */
  def merge(spark: SparkSession, qids: Array[Long],
      partials: RDD[Array[TopBuffer]], k: Int): DataFrame = {
    lazy val materialized: Array[org.apache.spark.sql.catalyst.InternalRow] = {
      mergeExecutions.incrementAndGet()
      val merged =
        try partials.treeReduce { (a, b) =>
          if (a.length == 0) b
          else if (b.length == 0) a
          else {
            var i = 0
            while (i < a.length) { a(i).absorb(b(i)); i += 1 }
            a
          }
        } catch { case _: UnsupportedOperationException =>
          // zero-partition input (empty relation): no winners
          Array.empty[TopBuffer]
        }
      val rows = new java.util.ArrayList[
        org.apache.spark.sql.catalyst.InternalRow]()
      var qi = 0
      while (qi < merged.length) {
        val buf = merged(qi)
        // layout order → the engine's standard (distance, id) ascending
        val order = Array.range(0, buf.size).sortWith { (a, b) =>
          val da = buf.distAt(a); val db = buf.distAt(b)
          da < db || (da == db && buf.idAt(a) < buf.idAt(b))
        }
        var p = 0
        while (p < order.length) {
          rows.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](qids(qi), buf.idAt(order(p)), buf.distAt(order(p)))))
          p += 1
        }
        qi += 1
      }
      rows.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](0))
    }
    graft.plans.LazyLocal.ofThunk(spark, outSchema, () => materialized,
      estBytes = qids.length.toLong * k * 24L)
  }
}
