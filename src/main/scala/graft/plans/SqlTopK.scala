package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.catalog.VecDB
import graft.functions.{VecDistance, VecDistanceKind}
import graft.operators.Knn

/** Index-backed SQL top-k rewrite (SURVEY §7.3): a `Rule[LogicalPlan]`
  * that turns
  *
  * {{{ SELECT …, vec_l2sq(vec, array(…)) AS d FROM t ORDER BY d LIMIT k }}}
  *
  * over a REGISTERED vector table into the engine's KNN search: the rule
  * runs the search on the driver (k winner ids — the same driver-eager
  * shape as a DPP subquery) and splices the winner ids back as an
  * `id IN (…)` filter directly above the scanned relation, leaving the
  * original Project/Sort/Limit on top of the pruned k-row input. Output
  * attributes, ordering, and schema are untouched — the full-table
  * distance sort is replaced by the engine's bounded top-k (or index)
  * search, and for a natively-long id column the spliced `IN` reaches the
  * parquet scan as a pushed filter (row-group pruning).
  *
  * Two registration flavors:
  *  - [[GraftSqlTopK.registerDataFrame]]: any (id, vec, …) DataFrame; the
  *    rewrite serves the EXACT bounded top-k scan
  *    ([[graft.operators.Knn.exactBroadcast]]) — value-identical to the
  *    `ORDER BY … LIMIT` it replaces (ties broken (distance, id)), so it
  *    is safe by default and DuckDB-oracle-able (`q_sql_topk`).
  *  - [[GraftSqlTopK.registerTable]]: a [[graft.catalog.VecDB]] table; the
  *    rewrite dispatches through [[graft.catalog.VecDB.searchBatch]] —
  *    HNSW/IVF/PQ index arms engage per the catalog's dispatch matrix.
  *    With an `ef` (session conf `graft.sql.topk.ef`) the search is
  *    approximate in exactly the way the API search is; leave it unset
  *    for the table's default dispatch.
  *
  * Matching survives the optimizer's view inlining and Project collapse:
  * the registered DataFrame's optimized plan is reduced to (single leaf
  * relation, vec-producing expression, id-producing expression), and a
  * candidate `Sort … LIMIT` matches when its scanned leaf `sameResult`s
  * the registered leaf and the sort key is this engine's
  * [[graft.functions.VecDistance]] between that vec expression and a
  * foldable query vector (attributes remapped by position, so a separately
  * re-read table with fresh exprIds still matches).
  *
  * Scope guards (no rewrite, never a wrong result): single ASC sort key,
  * distance kind must match the registered metric, `Project` (or nothing)
  * directly over the leaf; a `WHERE` between sort and scan disables the
  * rewrite (top-k of a filtered set ≠ filtered top-k) — EXCEPT a distance
  * upper bound on the sort key itself (`WHERE vec_l2sq(vec, q) <= ub … `,
  * the engine's P3 surface): such rows are a prefix of the distance
  * order, so the global top-k prune stays a superset of the answer and
  * the retained Filter re-applies the bound. `LIMIT k` ≤
  * `graft.sql.topk.maxK` (default 10k — the spliced id list is
  * driver-materialized). A rewritten child nests Filter-over-Filter above
  * the leaf, which the matcher rejects, so the fixed-point optimizer
  * batch terminates.
  */
object GraftSqlTopK {

  /** conf key: max LIMIT the rewrite will serve (ids are driver-resident) */
  val MaxKConf = "graft.sql.topk.maxK"
  /** conf key: ef for catalog-dispatched (registerTable) searches */
  val EfConf = "graft.sql.topk.ef"

  private[plans] case class Entry(
      leaf: LogicalPlan,
      vecExpr: Expression,
      idExpr: Expression,
      dist: String,
      search: (SparkSession, Array[Float], Int) => Array[Long])

  private val registry = TrieMap.empty[String, Entry]
  // weak set: enabling the rule must not pin a closed SparkSession
  private val enabled = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Add the rewrite rule to `spark.experimental.extraOptimizations`
    * (idempotent per session). */
  def enable(spark: SparkSession): Unit = synchronized {
    if (enabled.add(spark)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecTopKRewrite
    }
  }

  /** Register a plain (id, vec, …) DataFrame under `name`; rewrites serve
    * the exact bounded top-k scan. Re-registering a name replaces it. */
  def registerDataFrame(name: String, df: DataFrame, dist: String): Unit =
    registry(name) = mkEntry(df, dist, (spark, q, k) => {
      Knn.exactBroadcast(df.select("id", "vec"), queryDf(spark, q), k, dist)
        .select("id").collect().map(_.getLong(0))
    })

  /** Register a catalog table; rewrites dispatch through
    * [[VecDB.searchBatch]] (index arms engage; `graft.sql.topk.ef`). */
  def registerTable(name: String, db: VecDB, key: String): Unit =
    registry(name) = mkEntry(db.table(key), db.getDist(key), (spark, q, k) => {
      val ef = spark.conf.getOption(EfConf).map(_.toInt)
      db.searchBatch(key, queryDf(spark, q), k, ef = ef)
        .select("id").collect().map(_.getLong(0))
    })

  def unregister(name: String): Unit = registry.remove(name)
  def unregisterAll(): Unit = registry.clear()

  /** Reduce a registrable DataFrame to (leaf, vec expr, id expr): the plan
    * must be a plain projection over a single relation so the optimizer's
    * Project collapse cannot take a query out of matching range. */
  private def mkEntry(df: DataFrame, dist: String,
      search: (SparkSession, Array[Float], Int) => Array[Long]): Entry = {
    def sourceExpr(pl: Seq[NamedExpression], col: String): Expression =
      pl.collectFirst {
        case a: Alias if a.name == col => a.child
        case ar: AttributeReference if ar.name == col => ar
      }.getOrElse(throw new IllegalArgumentException(
        s"registered DataFrame must expose a '$col' column"))
    df.queryExecution.optimizedPlan match {
      case Project(pl, leaf: LeafNode) =>
        Entry(leaf, sourceExpr(pl, "vec"), sourceExpr(pl, "id"), dist, search)
      case leaf: LeafNode =>
        Entry(leaf, sourceExpr(leaf.output, "vec"),
          sourceExpr(leaf.output, "id"), dist, search)
      case other => throw new IllegalArgumentException(
        "registered DataFrame must be a plain projection over a single " +
          s"relation; got ${other.nodeName}")
    }
  }

  private def queryDf(spark: SparkSession, q: Array[Float]): DataFrame = {
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("query_vec", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(0L, q.toSeq)), schema)
  }

  /** table dist name → [[VecDistanceKind]] accepted in the sort key */
  private def kindFor(dist: String): Option[String] = dist match {
    case "l2sqr" => Some(VecDistanceKind.L2Sq)
    case "cosine" => Some(VecDistanceKind.Cosine)
    case _ => None
  }

  object VecTopKRewrite extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      plan.transformDown {
        case gl @ GlobalLimit(IntegerLiteral(k),
            ll @ LocalLimit(_, sort: Sort))
            if k > 0 && sort.global && sort.order.length == 1 &&
              sort.order.head.direction == Ascending =>
          rewrite(gl, ll, sort, k).getOrElse(gl)
      }
    }

    private def rewrite(gl: GlobalLimit, ll: LocalLimit, sort: Sort,
        k: Int): Option[LogicalPlan] = {
      val spark = SparkSession.active
      val maxK = spark.conf.getOption(MaxKConf).map(_.toInt).getOrElse(10000)
      if (k > maxK) return None
      // a Filter is in scope ONLY when its condition is an upper bound on
      // the sort key itself (`WHERE vec_l2sq(vec, q) <= ub ORDER BY … ` —
      // the engine's P3 distance-bound surface): rows passing such a
      // filter are a PREFIX of the distance order, so the filtered top-k
      // is always ⊆ the global top-k and the spliced id set stays a
      // superset of the true answer — the original Filter, left in place,
      // re-applies the bound. Any other predicate makes filtered-top-k ≠
      // top-k-filtered and declines the rewrite.
      val (projOpt, filterOpt, rel) = sort.child match {
        case p @ Project(_, f @ Filter(_, r: LeafNode)) => (Some(p), Some(f), r)
        case p @ Project(_, r: LeafNode) => (Some(p), None, r)
        case f @ Filter(_, r: LeafNode) => (None, Some(f), r)
        case r: LeafNode => (None, None, r)
        case _ => return None // Join/other below the sort: out of scope
      }
      registry.values.find(e => rel.sameResult(e.leaf)).flatMap { e =>
        // remap the registered vec/id expressions onto this scan's
        // attributes by position (sameResult ⇒ same schema order; exprIds
        // may differ when the table was re-read independently)
        val remap = AttributeMap(e.leaf.output.zip(rel.output))
        def remapped(ex: Expression): Expression = ex.transform {
          case a: AttributeReference => remap.getOrElse(a, a)
        }
        val vecExpr = remapped(e.vecExpr)
        val idExpr = remapped(e.idExpr)
        // resolve the sort key to a distance expression: either an alias
        // defined in the Project, or the expression itself
        val distExpr = sort.order.head.child match {
          case a: AttributeReference =>
            projOpt.flatMap(_.projectList.collectFirst {
              case al @ Alias(ex, _) if al.exprId == a.exprId => ex
            })
          case ex => Some(ex)
        }
        distExpr.collect {
          case de @ VecDistance(l, r, kind) if kindFor(e.dist).contains(kind) =>
            if (l.semanticEquals(vecExpr) && r.foldable) Some((de, r))
            else if (r.semanticEquals(vecExpr) && l.foldable) Some((de, l))
            else None
        }.flatten.filter { case (de, _) =>
          // with a WHERE present, it must be `dist ≤/< literal` on the
          // same distance expression (prefix-of-sort-order argument above)
          filterOpt.forall(_.condition match {
            case LessThanOrEqual(c, _: Literal) => c.semanticEquals(de)
            case LessThan(c, _: Literal) => c.semanticEquals(de)
            case GreaterThanOrEqual(_: Literal, c) => c.semanticEquals(de)
            case GreaterThan(_: Literal, c) => c.semanticEquals(de)
            case _ => false
          })
        }.map { case (_, qExpr) =>
          val qvec = evalQueryVector(qExpr)
          val ids = e.search(spark, qvec, k)
          val pruned = Filter(idIn(idExpr, ids), rel)
          val bounded = filterOpt match {
            case Some(f) => f.withNewChildren(Seq(pruned))
            case None => pruned
          }
          val newChild = projOpt match {
            case Some(p) => p.withNewChildren(Seq(bounded))
            case None => bounded
          }
          gl.withNewChildren(Seq(ll.withNewChildren(
            Seq(sort.withNewChildren(Seq(newChild))))))
        }
      }
    }

    /** `idExpr IN (ids…)`, unwrapping a widening int→long cast so the
      * predicate lands on the bare column and reaches the parquet scan
      * (the ids came from the table, so they fit the narrow type). */
    private def idIn(idExpr: Expression, ids: Array[Long]): Expression =
      idExpr match {
        case Cast(a: AttributeReference, LongType, _, _)
            if a.dataType == IntegerType =>
          In(a, ids.toIndexedSeq.map(i => Literal(i.toInt)))
        case ex =>
          In(ex, ids.toIndexedSeq.map(Literal(_)))
      }

    private def evalQueryVector(q: Expression): Array[Float] = {
      val v = q.eval(InternalRow.empty)
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      q.dataType match {
        case ArrayType(FloatType, _) => arr.toFloatArray()
        case ArrayType(DoubleType, _) => arr.toDoubleArray().map(_.toFloat)
        case other => throw new IllegalStateException(
          s"unexpected query vector type $other")
      }
    }
  }
}
