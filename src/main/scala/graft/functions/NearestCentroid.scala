package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** F11 — nearest centroid: argmin of distance over a fixed centroid set,
  * ties resolved to the lowest centroid id. Replicates the reference's
  * `find_nearest_base` (`/root/reference/src/distance/k_means.rs:40-57`,
  * `164-170`: a 1-element `ResultSet` whose (distance, index) ordering makes
  * ties pick the lowest index).
  *
  * The centroid matrix rides a BROADCAST handle, not the serialized
  * expression (r21, guide §2.6/§5): an embedded k × dim float matrix is
  * copied into EVERY task binary of every stage the expression appears in —
  * at kc=512 × d960 that is ~2 MB/task, the exact source of the r20 driver
  * run's wall-to-wall "task of very large size (2922 KiB)" warnings (the
  * kc512 encode/assign stages and the kc=500 4M build). As a broadcast the
  * tasks carry only the handle and each executor fetches the matrix once.
  * The per-row work reads the `ArrayData` directly with no boxing. Used for
  * IVF cluster assignment (one pass at build time) and the
  * centroid-histogram operator (A3).
  */
case class NearestCentroid(
    child: Expression,
    bcCentroids: Broadcast[Array[Array[Float]]],
    kind: String)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (bcCentroids.value.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("empty centroid set")
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float>/array<double>, got ${other.catalogString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // the row materialized ONCE per eval (not once per centroid): ArrayData
  // element reads are virtual calls — at assign-pass scale (N × k × dim
  // reads) they dominated the arithmetic; a single dim-length copy into a
  // primitive array pays N × dim reads instead (r18, part of the 4M
  // route-stage flattening)
  @transient private lazy val rowBuf = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] =
      new Array[Double](bcCentroids.value(0).length)
  }

  override def nullSafeEval(input: Any): Any = {
    val centroids = bcCentroids.value
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val cosine = kind == "cosine"
    var buf = rowBuf.get()
    if (buf.length != n) { buf = new Array[Double](n); rowBuf.set(buf) }
    var i = 0
    if (isFloat) while (i < n) { buf(i) = v.getFloat(i).toDouble; i += 1 }
    else while (i < n) { buf(i) = v.getDouble(i); i += 1 }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      require(cent.length == n,
        s"nearest_centroid: dimension mismatch ($n vs ${cent.length})")
      var d = 0.0
      i = 0
      if (cosine) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        while (i < n) {
          val x = buf(i)
          val y = cent(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        d = 1.0 - dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
      } else { // l2sqr — partial sums are monotone: once d exceeds the
        // current best STRICTLY the centroid cannot win (strict < keeps
        // lowest id on ties either way), so bail in 128-element blocks.
        // Selection-neutral: per-centroid summation order is unchanged
        // and only never-winning centroids are cut short.
        var live = true
        while (live && i < n) {
          val blockEnd = math.min(i + 128, n)
          while (i < blockEnd) {
            val diff = buf(i) - cent(i); d += diff * diff; i += 1
          }
          if (d > bestD) live = false
        }
      }
      if (d < bestD) { bestD = d; best = c } // strict < keeps lowest id on ties
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

/** Sound blocking for L2 threshold self-joins: the ids of every centroid
  * whose L2 distance to the row is ≤ min-centroid-distance + `margin`.
  *
  * With `margin = 2t`, any pair (a, b) with ‖a−b‖ ≤ t shares at least one
  * bucket: let c* be a's nearest centroid; then
  * d(b,c*) ≤ d(b,a) + d(a,c*) = t + min_c d(a,c) ≤ min_c d(b,c) + 2t
  * (the last step because min_c d(a,c) ≤ d(a, c_b*) ≤ d(b, c_b*) + t).
  * So a emits c* (margin 0 suffices) and b emits c* (margin 2t suffices) —
  * the pair meets in bucket c*. No pair below the threshold is ever missed,
  * regardless of centroid quality; centroid quality only affects bucket
  * sizes (cost), not correctness.
  *
  * Centroids ride a broadcast handle like [[NearestCentroid]] (r21).
  */
case class CentroidsWithinRadius(
    child: Expression,
    bcCentroids: Broadcast[Array[Array[Float]]],
    margin: Double)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (bcCentroids.value.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("empty centroid set")
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroids_within_radius requires array<float>/array<double>, got ${other.catalogString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val centroids = bcCentroids.value
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val ds = new Array[Double](centroids.length)
    var dmin = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      require(cent.length == n,
        s"centroids_within_radius: dimension mismatch ($n vs ${cent.length})")
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = x - cent(i); acc += diff * diff; i += 1
      }
      val d = math.sqrt(acc)
      ds(c) = d
      if (d < dmin) dmin = d
      c += 1
    }
    val cutoff = dmin + margin
    val out = scala.collection.mutable.ArrayBuilder.make[Any]
    c = 0
    while (c < centroids.length) {
      if (ds(c) <= cutoff) out += c
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "centroids_within_radius"
}
