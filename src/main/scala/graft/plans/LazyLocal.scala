package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.StructType

/** A driver-local relation whose rows are produced by a thunk at EXECUTION
  * time — `LocalRelation`'s broadcast-without-a-job economics without its
  * eager materialization.
  *
  * [[graft.operators.CoarseMerge.merge]] needs exactly this shape: the
  * merged coarse winner set is small (gate-bounded under
  * `CoarseMerge.maxBytes`), lives on the driver after a `treeReduce`, and
  * is usually consumed by a broadcast rerank join — but running the
  * treeReduce at DataFrame-CONSTRUCTION time (the r17 shape) broke the
  * laziness contract of every public coarse entry point: composing callers
  * saw a full corpus scan fire from a `.explain`, or from merely building
  * a plan they never executed. Here the scan fires the first time the plan
  * actually EXECUTES: [[LazyLocalScanExec.executeCollect]] (the
  * BroadcastExchange path) returns the thunk's rows with no extra job —
  * LocalTableScanExec's contract — and [[LazyLocalScanExec.doExecute]]
  * parallelizes them for non-broadcast consumers.
  *
  * The thunk must be idempotent-cheap on re-entry (memoize expensive work
  * with a `lazy val` behind it — [[graft.operators.CoarseMerge.merge]]
  * does): separate Datasets over the same logical node each build their own
  * exec node, and each exec node caches rows only for its own lifetime.
  */
case class LazyLocalRelation(
    output: Seq[Attribute],
    @transient thunk: () => Array[InternalRow],
    estBytes: Long) extends LeafNode {
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = math.max(1L, estBytes))
}

/** Physical scan for [[LazyLocalRelation]]: runs the thunk on the driver at
  * first execution (never at planning/explain time). */
case class LazyLocalScanExec(
    output: Seq[Attribute],
    // @transient: the thunk (and anything it captures — RDD lineage, the
    // session) is DRIVER-ONLY. Spark serializes exec subtrees into task
    // binaries on some paths (e.g. a SortExec inside a whole-stage codegen
    // evaluator factory under AQE drags its canonicalized child chain
    // along); by then doExecute/executeCollect have already run driver-side,
    // so executors never need the thunk.
    @transient thunk: () => Array[InternalRow]) extends LeafExecNode {

  // one materialization per exec node: executeCollect (broadcast) and
  // doExecute (distributed consumers) share it
  @transient private lazy val unsafeRows: Array[InternalRow] = {
    val proj = UnsafeProjection.create(output, output)
    thunk().map(r => proj(r).copy().asInstanceOf[InternalRow])
  }

  /** Materialize on the MAIN driver thread, before any broadcast future
    * exists. `SparkPlan.prepare()` prepares children before the parent's
    * `doPrepare()`, so this runs before `BroadcastExchangeExec.doPrepare`
    * submits its relation future — whose await is capped by
    * `spark.sql.broadcastTimeout` (300 s default). Without this, a
    * merge-eligible coarse scan over a large corpus ran INSIDE that future
    * and a slow scan failed as a spurious broadcast timeout; here the
    * future's `executeCollect` finds the memoized rows and returns
    * instantly. Still lazy for planning/explain: `prepare()` only runs on
    * the execution path. */
  protected override def doPrepare(): Unit = { unsafeRows; () }

  protected override def doExecute(): RDD[InternalRow] = {
    val rows = unsafeRows
    val slices = math.max(1,
      math.min(sparkContext.defaultParallelism, 1 + rows.length / 65536))
    sparkContext.parallelize(rows.toIndexedSeq, slices)
  }

  /** No job: the rows are already driver-local once the thunk runs —
    * `LocalTableScanExec`'s broadcast economics. */
  override def executeCollect(): Array[InternalRow] = unsafeRows

  override def executeTake(limit: Int): Array[InternalRow] =
    unsafeRows.take(limit)
}

/** Plans [[LazyLocalRelation]]; registered per-session via
  * [[LazyLocal.ensureStrategy]] (sessions are caller-supplied — this
  * library cannot rely on `SparkSessionExtensions` having been installed
  * at session-build time). */
object LazyLocalStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LazyLocalRelation(output, thunk, _) =>
      LazyLocalScanExec(output, thunk) :: Nil
    case _ => Nil
  }
}

object LazyLocal {

  /** Idempotently append [[LazyLocalStrategy]] to the session's
    * experimental strategies (public API, runtime-mutable — the supported
    * post-construction injection point). */
  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(LazyLocalStrategy))
      spark.experimental.extraStrategies = cur :+ LazyLocalStrategy
  }

  /** Wrap a row thunk as a lazily-materialized DataFrame. */
  def ofThunk(spark: SparkSession, schema: StructType,
      thunk: () => Array[InternalRow], estBytes: Long): DataFrame = {
    ensureStrategy(spark)
    ColumnShim.ofRows(spark,
      LazyLocalRelation(DataTypeUtils.toAttributes(schema), thunk, estBytes))
  }
}
