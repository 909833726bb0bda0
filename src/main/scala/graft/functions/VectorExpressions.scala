package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Distance kinds supported by the engine.
  *
  * Mirrors the reference's `DistanceAlgorithm` enum (L2Sqr, Cosine — see
  * `/root/reference/src/distance/mod.rs:17-28`) plus the dot-product /
  * norm primitives it is built from (`/root/reference/src/distance/mod.rs:46-85`).
  */
object VecDistanceKind {
  val Dot = "dot"
  val L2Sq = "l2sq"
  val Cosine = "cosine"
  val all: Seq[String] = Seq(Dot, L2Sq, Cosine)
}

/** Codegen'd binary vector distance over two `array<float>` / `array<double>`
  * columns, accumulating in double. Stays inside whole-stage codegen (a tight
  * scalar loop, no intermediate arrays — unlike `aggregate(zip_with(...))`).
  *
  * Semantics replicated from the reference:
  *  - dot: Σ aᵢ·bᵢ (`/root/reference/src/distance/mod.rs:71-77`)
  *  - l2sq: Σ (aᵢ−bᵢ)² (`/root/reference/src/distance/mod.rs:51`)
  *  - cosine: 1 − dot/max(‖a‖·‖b‖, 1e-10), range [0,2] — note the 1e-10
  *    clamp (`/root/reference/src/distance/mod.rs:60-69`)
  *
  * Dimension mismatch raises, matching the reference's dim checks
  * (`/root/reference/src/database/mod.rs:425-431`).
  */
case class VecDistance(left: Expression, right: Expression, kind: String)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!VecDistanceKind.all.contains(kind))
      TypeCheckResult.TypeCheckFailure(s"unknown distance kind '$kind'")
    else if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_$kind requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_$kind: dimension mismatch (${n} vs ${b.numElements()})")
    val lf = isFloat(left); val rf = isFloat(right)
    var i = 0
    kind match {
      case VecDistanceKind.Dot =>
        var acc = 0.0
        while (i < n) {
          val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
          val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
          acc += x * y; i += 1
        }
        acc
      case VecDistanceKind.L2Sq =>
        var acc = 0.0
        while (i < n) {
          val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
          val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
          val d = x - y; acc += d * d; i += 1
        }
        acc
      case VecDistanceKind.Cosine =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        while (i < n) {
          val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
          val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        1.0 - dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = if (isFloat(left)) "getFloat" else "getDouble"
    val ra = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val body = kind match {
        case VecDistanceKind.Dot =>
          val acc = ctx.freshName("acc")
          s"""double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = (double) $a.$la($i);
             |  double $y = (double) $b.$ra($i);
             |  $acc += $x * $y;
             |}
             |${ev.value} = $acc;""".stripMargin
        case VecDistanceKind.L2Sq =>
          val acc = ctx.freshName("acc")
          val d = ctx.freshName("d")
          s"""double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = (double) $a.$la($i);
             |  double $y = (double) $b.$ra($i);
             |  double $d = $x - $y;
             |  $acc += $d * $d;
             |}
             |${ev.value} = $acc;""".stripMargin
        case VecDistanceKind.Cosine =>
          val dot = ctx.freshName("dot")
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          s"""double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = (double) $a.$la($i);
             |  double $y = (double) $b.$ra($i);
             |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
             |}
             |${ev.value} = 1.0 - $dot / Math.max(Math.sqrt($na) * Math.sqrt($nb), 1e-10);""".stripMargin
      }
      s"""int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_$kind: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |$body""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = s"vec_$kind"
}

/** Column-level vector functions — the engine's F1–F4 scalar surface
  * (SURVEY §2.8; reference `/root/reference/src/distance/mod.rs`).
  */
object VectorFunctions {
  private def e(c: Column): Expression = ColumnShim.expression(c)
  private def col(expr: Expression): Column = ColumnShim.column(expr)

  /** F1 — dot product Σ aᵢbᵢ. */
  def vecDot(a: Column, b: Column): Column = col(VecDistance(e(a), e(b), VecDistanceKind.Dot))

  /** F3 — squared L2 distance Σ (aᵢ−bᵢ)². */
  def vecL2Sq(a: Column, b: Column): Column = col(VecDistance(e(a), e(b), VecDistanceKind.L2Sq))

  /** F4 — cosine distance 1 − dot/max(‖a‖‖b‖, 1e-10). */
  def vecCosine(a: Column, b: Column): Column = col(VecDistance(e(a), e(b), VecDistanceKind.Cosine))

  /** F2 — L2 norm √(a·a) (`/root/reference/src/distance/mod.rs:46-48`). */
  def vecNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vecDot(a, a))

  /** F5 — dispatch by algorithm name, mirroring the reference's
    * `DistanceAlgorithm::d` (`/root/reference/src/distance/mod.rs:96-129`
    * string forms `/root/reference/src/pyo3/mod.rs:15-31`).
    */
  def distance(a: Column, b: Column, dist: String): Column = dist match {
    case "l2sqr"  => vecL2Sq(a, b)
    case "cosine" => vecCosine(a, b)
    case other    => throw new IllegalArgumentException(s"unknown distance '$other'")
  }

  /** Register SQL names (vec_dot / vec_l2sq / vec_cosine) in a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(VecDistanceKind.Dot, VecDistanceKind.L2Sq, VecDistanceKind.Cosine).foreach { k =>
      reg.createOrReplaceTempFunction(
        s"vec_$k",
        exprs => {
          if (exprs.length != 2)
            throw new IllegalArgumentException(
              s"vec_$k requires exactly 2 arguments (got ${exprs.length})")
          VecDistance(exprs(0), exprs(1), k)
        },
        // Spark 4 validates the source tag against a fixed list —
        // "builtin" (no hyphen) throws at resolution time
        "built-in")
    }
    // binary-quantization surface: pack + Hamming are model-free, so they
    // are directly SQL-expressible (SQ/PQ need a trained model and stay on
    // the DataFrame/catalog API)
    reg.createOrReplaceTempFunction(
      "bq_pack",
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"bq_pack requires exactly 1 argument (got ${exprs.length})")
        BitPackSign(exprs(0))
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "bq_hamming",
      exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"bq_hamming requires exactly 2 arguments (got ${exprs.length})")
        HammingDistance(exprs(0), exprs(1))
      },
      "built-in")
  }
}
