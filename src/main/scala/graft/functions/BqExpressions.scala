package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Binary (sign-bit) quantization kernel — 1 bit per dimension, packed into
  * 64-bit words. A d960 float vector (3,840 B) compresses to 15 longs
  * (120 B): 32× less memory traffic per scanned row, with Hamming distance
  * (XOR + popcount) as the coarse metric. Scale extension beyond the
  * reference's PQ surface (`/root/reference/src/distance/pq_table.rs` is the
  * nearest analog — codebook quantization; BQ is the codebook-free end of
  * the same spectrum): the standard first-pass filter for billion-row ANN
  * serving, re-ranked exactly on the survivors.
  *
  * Bit convention: bit `j` of word `w` is set iff `v(64·w + j) >= 0`
  * (negative zero packs as set, matching Java/SQL `-0.0 >= 0`). Hamming
  * between two packed arrays equals the number of dimensions whose signs
  * disagree — which is exactly how the DuckDB oracle recomputes it
  * (per-element sign comparison, no packing).
  */
object BqKernel {

  def words(dim: Int): Int = (dim + 63) >>> 6

  /** Pack sign bits of a float vector into `ceil(d/64)` longs. */
  def pack(v: Array[Float]): Array[Long] = {
    val out = new Array[Long](words(v.length))
    var i = 0
    while (i < v.length) {
      if (v(i) >= 0f) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    out
  }

  /** Pack threshold bits: bit set iff `v(i) >= thr(i)`. With `thr` = the
    * per-dim corpus mean ([[graft.operators.Bq.train]]) each bit splits the
    * corpus ~50/50 — raw sign bits carry near-zero information on any
    * corpus whose dims are not already centered (an all-positive corpus
    * packs every row identically and the Hamming coarse pass degenerates
    * to random selection). */
  def packCentered(v: Array[Float], thr: Array[Double]): Array[Long] = {
    if (v.length != thr.length)
      throw new IllegalArgumentException(
        s"bq_pack: dimension mismatch (vector ${v.length} vs thresholds ${thr.length})")
    val out = new Array[Long](words(v.length))
    var i = 0
    while (i < v.length) {
      if (v(i) >= thr(i)) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    out
  }

  /** Hamming distance between two packed sign arrays. Validates word
    * counts with the same message as [[HammingDistance]]: a longer corpus
    * row would otherwise silently truncate to a wrong distance and a
    * shorter one would throw a bare ArrayIndexOutOfBoundsException. */
  def hamming(a: Array[Long], b: Array[Long]): Int = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"bq_hamming: word-count mismatch (${a.length} vs ${b.length})")
    var acc = 0
    var i = 0
    while (i < a.length) {
      acc += java.lang.Long.bitCount(a(i) ^ b(i))
      i += 1
    }
    acc
  }
}

/** Codegen'd sign-bit packing: `array<float|double>` → `array<bigint>`.
  * See [[BqKernel]] for the bit layout. */
case class BitPackSign(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bq_pack requires array<float>/array<double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long]((n + 63) >>> 6)
    var i = 0
    if (isFloat) {
      while (i < n) {
        if (a.getFloat(i) >= 0f) out(i >>> 6) |= 1L << (i & 63)
        i += 1
      }
    } else {
      while (i < n) {
        if (a.getDouble(i) >= 0d) out(i >>> 6) |= 1L << (i & 63)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val arr = ctx.freshName("packed")
      s"""int $n = $a.numElements();
         |long[] $arr = new long[($n + 63) >>> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.$acc($i) >= 0) $arr[$i >>> 6] |= 1L << ($i & 63);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bq_pack"
}

/** Codegen'd threshold-bit packing: `array<float|double>` → `array<bigint>`,
  * bit `j` of word `w` set iff `v(64·w + j) >= thresholds(64·w + j)` — the
  * centered variant of [[BitPackSign]] (which this generalizes: an all-zero
  * threshold vector reproduces it bit for bit). The threshold vector is a
  * plan-level constant (per-dim corpus means from [[graft.operators.Bq
  * .train]]), shipped once per task as a codegen reference object. */
case class BitPackCentered(child: Expression, thresholds: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bq_pack requires array<float>/array<double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != thresholds.length)
      throw new IllegalArgumentException(
        s"bq_pack: dimension mismatch (vector $n vs thresholds ${thresholds.length})")
    val out = new Array[Long]((n + 63) >>> 6)
    var i = 0
    if (isFloat) {
      while (i < n) {
        if (a.getFloat(i) >= thresholds(i)) out(i >>> 6) |= 1L << (i & 63)
        i += 1
      }
    } else {
      while (i < n) {
        if (a.getDouble(i) >= thresholds(i)) out(i >>> 6) |= 1L << (i & 63)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (isFloat) "getFloat" else "getDouble"
    val thrRef = ctx.addReferenceObj("bqThresholds", thresholds, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val arr = ctx.freshName("packed")
      s"""int $n = $a.numElements();
         |if ($n != $thrRef.length) {
         |  throw new IllegalArgumentException("bq_pack: dimension mismatch (vector "
         |    + $n + " vs thresholds " + $thrRef.length + ")");
         |}
         |long[] $arr = new long[($n + 63) >>> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.$acc($i) >= $thrRef[$i]) $arr[$i >>> 6] |= 1L << ($i & 63);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bq_pack_centered"
}

/** Codegen'd Hamming distance between two packed sign arrays
  * (`array<bigint>` × `array<bigint>` → `bigint`): XOR + popcount per word.
  * Equals the count of sign-disagreeing dimensions of the original vectors. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bq_hamming requires array<bigint> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"bq_hamming: word-count mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "bq_hamming: word-count mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bq_hamming"
}
