package graft.index

import jdk.incubator.vector.{FloatVector, VectorOperators, VectorSpecies}

/** Distance kernels for executor-local hot loops (HNSW traversal, local
  * k-means). Two tiers:
  *
  *  - `l2sq`/`dot`/`cosine`: SIMD float-lane kernels (Java Vector API;
  *    AVX-512 = 16 lanes). Float accumulation — exactly the reference's own
  *    arithmetic (`/root/reference/src/distance/mod.rs:71-85` accumulates
  *    f32), ~8× the scalar-double throughput. Used for graph TRAVERSAL,
  *    where ordering robustness, not bit-exact values, is what matters.
  *  - `l2sqExact`/`cosineExact`: sequential double accumulation, matching
  *    the engine's Spark-side `VecDistance` convention. Used to re-score
  *    the few returned candidates so reported distances hash-match the
  *    DuckDB oracle at 6 decimals.
  *
  * (A double-accumulating SIMD variant via `F2D` converts was measured
  * SLOWER than scalar — the converts are not intrinsified on this JDK.)
  */
object Simd {
  private val FS: VectorSpecies[java.lang.Float] = FloatVector.SPECIES_PREFERRED

  def l2sq(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    val upper = FS.loopBound(n)
    var acc = FloatVector.zero(FS)
    var i = 0
    while (i < upper) {
      val d = FloatVector.fromArray(FS, a, i).sub(FloatVector.fromArray(FS, b, i))
      acc = d.fma(d, acc)
      i += FS.length()
    }
    var s = acc.reduceLanes(VectorOperators.ADD).toDouble
    while (i < n) { val dd = a(i).toDouble - b(i); s += dd * dd; i += 1 }
    s
  }

  def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    val upper = FS.loopBound(n)
    var acc = FloatVector.zero(FS)
    var i = 0
    while (i < upper) {
      acc = FloatVector.fromArray(FS, a, i).fma(FloatVector.fromArray(FS, b, i), acc)
      i += FS.length()
    }
    var s = acc.reduceLanes(VectorOperators.ADD).toDouble
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** Cosine distance with the reference's 1e-10 clamp. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    val upper = FS.loopBound(n)
    var accD = FloatVector.zero(FS)
    var accA = FloatVector.zero(FS)
    var accB = FloatVector.zero(FS)
    var i = 0
    while (i < upper) {
      val va = FloatVector.fromArray(FS, a, i)
      val vb = FloatVector.fromArray(FS, b, i)
      accD = va.fma(vb, accD)
      accA = va.fma(va, accA)
      accB = vb.fma(vb, accB)
      i += FS.length()
    }
    var d = accD.reduceLanes(VectorOperators.ADD).toDouble
    var na = accA.reduceLanes(VectorOperators.ADD).toDouble
    var nb = accB.reduceLanes(VectorOperators.ADD).toDouble
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    1.0 - d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
  }

  // ------------------------------------------------- exact (double) tier

  def l2sqExact(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); acc += d * d; i += 1 }
    acc
  }

  def cosineExact(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    1.0 - d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
  }
}
