package graft.index

import jdk.incubator.vector.{ByteVector, FloatVector, IntVector, VectorOperators, VectorSpecies}

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
    val L = FS.length()
    // 4 independent accumulators: a single-accumulator fma chain is
    // latency-bound (~4-5 cycles per step), which measured ~4× slower than
    // this on dim-960 inputs.
    val upper4 = n - n % (4 * L)
    var acc0 = FloatVector.zero(FS); var acc1 = FloatVector.zero(FS)
    var acc2 = FloatVector.zero(FS); var acc3 = FloatVector.zero(FS)
    var i = 0
    while (i < upper4) {
      val d0 = FloatVector.fromArray(FS, a, i).sub(FloatVector.fromArray(FS, b, i))
      val d1 = FloatVector.fromArray(FS, a, i + L).sub(FloatVector.fromArray(FS, b, i + L))
      val d2 = FloatVector.fromArray(FS, a, i + 2 * L).sub(FloatVector.fromArray(FS, b, i + 2 * L))
      val d3 = FloatVector.fromArray(FS, a, i + 3 * L).sub(FloatVector.fromArray(FS, b, i + 3 * L))
      acc0 = d0.fma(d0, acc0); acc1 = d1.fma(d1, acc1)
      acc2 = d2.fma(d2, acc2); acc3 = d3.fma(d3, acc3)
      i += 4 * L
    }
    val upper = FS.loopBound(n)
    while (i < upper) {
      val d = FloatVector.fromArray(FS, a, i).sub(FloatVector.fromArray(FS, b, i))
      acc0 = d.fma(d, acc0)
      i += L
    }
    var s = acc0.add(acc1).add(acc2.add(acc3))
      .reduceLanes(VectorOperators.ADD).toDouble
    while (i < n) { val dd = a(i).toDouble - b(i); s += dd * dd; i += 1 }
    s
  }

  /** l2sq against a slice of a packed matrix (row `off/dim` of a flat
    * `float[]`): the pointer-chase-free layout the graph walk uses. */
  def l2sqOff(a: Array[Float], b: Array[Float], off: Int): Double = {
    val n = a.length
    val L = FS.length()
    val upper4 = n - n % (4 * L)
    var acc0 = FloatVector.zero(FS); var acc1 = FloatVector.zero(FS)
    var acc2 = FloatVector.zero(FS); var acc3 = FloatVector.zero(FS)
    var i = 0
    while (i < upper4) {
      val d0 = FloatVector.fromArray(FS, a, i).sub(FloatVector.fromArray(FS, b, off + i))
      val d1 = FloatVector.fromArray(FS, a, i + L).sub(FloatVector.fromArray(FS, b, off + i + L))
      val d2 = FloatVector.fromArray(FS, a, i + 2 * L).sub(FloatVector.fromArray(FS, b, off + i + 2 * L))
      val d3 = FloatVector.fromArray(FS, a, i + 3 * L).sub(FloatVector.fromArray(FS, b, off + i + 3 * L))
      acc0 = d0.fma(d0, acc0); acc1 = d1.fma(d1, acc1)
      acc2 = d2.fma(d2, acc2); acc3 = d3.fma(d3, acc3)
      i += 4 * L
    }
    val upper = FS.loopBound(n)
    while (i < upper) {
      val d = FloatVector.fromArray(FS, a, i).sub(FloatVector.fromArray(FS, b, off + i))
      acc0 = d.fma(d, acc0)
      i += L
    }
    var s = acc0.add(acc1).add(acc2.add(acc3))
      .reduceLanes(VectorOperators.ADD).toDouble
    while (i < n) { val dd = a(i).toDouble - b(off + i); s += dd * dd; i += 1 }
    s
  }

  /** cosine against a packed-matrix slice; 1e-10 clamp as [[cosine]]. */
  def cosineOff(a: Array[Float], b: Array[Float], off: Int): Double = {
    val n = a.length
    val L = FS.length()
    val upper2 = n - n % (2 * L)
    var accD0 = FloatVector.zero(FS); var accD1 = FloatVector.zero(FS)
    var accA0 = FloatVector.zero(FS); var accA1 = FloatVector.zero(FS)
    var accB0 = FloatVector.zero(FS); var accB1 = FloatVector.zero(FS)
    var i = 0
    while (i < upper2) {
      val va0 = FloatVector.fromArray(FS, a, i)
      val vb0 = FloatVector.fromArray(FS, b, off + i)
      val va1 = FloatVector.fromArray(FS, a, i + L)
      val vb1 = FloatVector.fromArray(FS, b, off + i + L)
      accD0 = va0.fma(vb0, accD0); accD1 = va1.fma(vb1, accD1)
      accA0 = va0.fma(va0, accA0); accA1 = va1.fma(va1, accA1)
      accB0 = vb0.fma(vb0, accB0); accB1 = vb1.fma(vb1, accB1)
      i += 2 * L
    }
    val upper = FS.loopBound(n)
    while (i < upper) {
      val va = FloatVector.fromArray(FS, a, i)
      val vb = FloatVector.fromArray(FS, b, off + i)
      accD0 = va.fma(vb, accD0); accA0 = va.fma(va, accA0); accB0 = vb.fma(vb, accB0)
      i += L
    }
    var d = accD0.add(accD1).reduceLanes(VectorOperators.ADD).toDouble
    var na = accA0.add(accA1).reduceLanes(VectorOperators.ADD).toDouble
    var nb = accB0.add(accB1).reduceLanes(VectorOperators.ADD).toDouble
    while (i < n) {
      val x = a(i).toDouble; val y = b(off + i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    1.0 - d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
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

  /** dot(q, row) against a packed matrix row — the cached-norm build
    * identity's kernel: one fma stream per lane vs l2sqOff's sub+fma
    * (~1.5-2× fewer ops at the same memory traffic). 4× unrolled like
    * l2sqOff2. */
  def dotOff(a: Array[Float], b: Array[Float], off: Int): Double = {
    val n = a.length
    val L = FS.length()
    val upper4 = n - n % (4 * L)
    var acc0 = FloatVector.zero(FS); var acc1 = FloatVector.zero(FS)
    var acc2 = FloatVector.zero(FS); var acc3 = FloatVector.zero(FS)
    var i = 0
    while (i < upper4) {
      acc0 = FloatVector.fromArray(FS, a, i).fma(FloatVector.fromArray(FS, b, off + i), acc0)
      acc1 = FloatVector.fromArray(FS, a, i + L).fma(FloatVector.fromArray(FS, b, off + i + L), acc1)
      acc2 = FloatVector.fromArray(FS, a, i + 2 * L).fma(FloatVector.fromArray(FS, b, off + i + 2 * L), acc2)
      acc3 = FloatVector.fromArray(FS, a, i + 3 * L).fma(FloatVector.fromArray(FS, b, off + i + 3 * L), acc3)
      i += 4 * L
    }
    val upper = n - n % L
    while (i < upper) {
      acc0 = FloatVector.fromArray(FS, a, i).fma(FloatVector.fromArray(FS, b, off + i), acc0)
      i += L
    }
    var s = acc0.add(acc1).add(acc2.add(acc3))
      .reduceLanes(VectorOperators.ADD).toDouble
    while (i < n) { s += a(i).toDouble * b(off + i); i += 1 }
    s
  }

  /** dot between two rows of packed matrices ([[dotOff]]'s two-offset
    * twin). */
  def dotOff2(a: Array[Float], offA: Int, b: Array[Float], offB: Int, dim: Int): Double = {
    val L = FS.length()
    val upper4 = dim - dim % (4 * L)
    var acc0 = FloatVector.zero(FS); var acc1 = FloatVector.zero(FS)
    var acc2 = FloatVector.zero(FS); var acc3 = FloatVector.zero(FS)
    var i = 0
    while (i < upper4) {
      acc0 = FloatVector.fromArray(FS, a, offA + i).fma(FloatVector.fromArray(FS, b, offB + i), acc0)
      acc1 = FloatVector.fromArray(FS, a, offA + i + L).fma(FloatVector.fromArray(FS, b, offB + i + L), acc1)
      acc2 = FloatVector.fromArray(FS, a, offA + i + 2 * L).fma(FloatVector.fromArray(FS, b, offB + i + 2 * L), acc2)
      acc3 = FloatVector.fromArray(FS, a, offA + i + 3 * L).fma(FloatVector.fromArray(FS, b, offB + i + 3 * L), acc3)
      i += 4 * L
    }
    val upper = dim - dim % L
    while (i < upper) {
      acc0 = FloatVector.fromArray(FS, a, offA + i).fma(FloatVector.fromArray(FS, b, offB + i), acc0)
      i += L
    }
    var s = acc0.add(acc1).add(acc2.add(acc3))
      .reduceLanes(VectorOperators.ADD).toDouble
    while (i < dim) { s += a(offA + i).toDouble * b(offB + i); i += 1 }
    s
  }

  /** l2sq between two rows of packed matrices. */
  def l2sqOff2(a: Array[Float], offA: Int, b: Array[Float], offB: Int, dim: Int): Double = {
    val L = FS.length()
    val upper4 = dim - dim % (4 * L)
    var acc0 = FloatVector.zero(FS); var acc1 = FloatVector.zero(FS)
    var acc2 = FloatVector.zero(FS); var acc3 = FloatVector.zero(FS)
    var i = 0
    while (i < upper4) {
      val d0 = FloatVector.fromArray(FS, a, offA + i).sub(FloatVector.fromArray(FS, b, offB + i))
      val d1 = FloatVector.fromArray(FS, a, offA + i + L).sub(FloatVector.fromArray(FS, b, offB + i + L))
      val d2 = FloatVector.fromArray(FS, a, offA + i + 2 * L).sub(FloatVector.fromArray(FS, b, offB + i + 2 * L))
      val d3 = FloatVector.fromArray(FS, a, offA + i + 3 * L).sub(FloatVector.fromArray(FS, b, offB + i + 3 * L))
      acc0 = d0.fma(d0, acc0); acc1 = d1.fma(d1, acc1)
      acc2 = d2.fma(d2, acc2); acc3 = d3.fma(d3, acc3)
      i += 4 * L
    }
    val upper = dim - dim % L
    while (i < upper) {
      val d = FloatVector.fromArray(FS, a, offA + i).sub(FloatVector.fromArray(FS, b, offB + i))
      acc0 = d.fma(d, acc0)
      i += L
    }
    var s = acc0.add(acc1).add(acc2.add(acc3))
      .reduceLanes(VectorOperators.ADD).toDouble
    while (i < dim) { val dd = a(offA + i).toDouble - b(offB + i); s += dd * dd; i += 1 }
    s
  }

  /** cosine between two rows of packed matrices; 1e-10 clamp. */
  def cosineOff2(a: Array[Float], offA: Int, b: Array[Float], offB: Int, dim: Int): Double = {
    val L = FS.length()
    val upper = dim - dim % L
    var accD = FloatVector.zero(FS)
    var accA = FloatVector.zero(FS)
    var accB = FloatVector.zero(FS)
    var i = 0
    while (i < upper) {
      val va = FloatVector.fromArray(FS, a, offA + i)
      val vb = FloatVector.fromArray(FS, b, offB + i)
      accD = va.fma(vb, accD)
      accA = va.fma(va, accA)
      accB = vb.fma(vb, accB)
      i += L
    }
    var d = accD.reduceLanes(VectorOperators.ADD).toDouble
    var na = accA.reduceLanes(VectorOperators.ADD).toDouble
    var nb = accB.reduceLanes(VectorOperators.ADD).toDouble
    while (i < dim) {
      val x = a(offA + i).toDouble; val y = b(offB + i).toDouble
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

  /** Exact double-accumulation l2sq against a packed-matrix row. */
  def l2sqExactOff(a: Array[Float], b: Array[Float], off: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(off + i); acc += d * d; i += 1 }
    acc
  }

  /** Exact double-accumulation cosine against a packed-matrix row. */
  def cosineExactOff(a: Array[Float], b: Array[Float], off: Int): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(off + i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    1.0 - d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
  }

  def cosineExact(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    1.0 - d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
  }

  // ---- PQ fast-scan (4-bit codes, k = 16) ---------------------------------
  // A 16-entry group LUT fits exactly one 512-bit float vector, so the
  // per-(group, 16 rows) ADC step is ONE in-register permute
  // (idx.selectFrom(lut) — vpermd on AVX-512F) plus one add: 16 lookups per
  // ~4 instructions, vs ~5 instructions per lookup for the scalar
  // gather-by-subscript loop in PqKernel.adcScanChunk. Float accumulation in
  // a different order than the scalar path — selection-grade, like every
  // traversal kernel here; winners are exact re-ranked downstream.
  // Codes must be pre-transposed into 16-row blocks, group-major within the
  // block (PqKernel.transposeCodes16).

  private val IS512 = IntVector.SPECIES_512
  private val FS512 = FloatVector.SPECIES_512
  private val BS128 = ByteVector.SPECIES_128

  /** Hardware gate: the 512-bit species must be the platform's preferred
    * width, else the Vector API emulates the permutes lane-by-lane (slower
    * than the scalar loop). Evaluated per-JVM; serve-index broadcasts bake
    * the DRIVER's answer in at build time, so a heterogeneous cluster with
    * narrower executors would run emulated permutes there — correct but
    * slow (homogeneous clusters assumed; see `Pq.ServeIndex`). */
  val fastScan16: Boolean = FS.length() == 16

  /** One 16-row block × 4 queries. `lutN` are the queries' group-major ADC
    * LUTs as raw float bits (`Float.floatToRawIntBits`, 16 ints per group);
    * writes the 4×16 accumulated sums into `sums` (query-major). */
  def adcBlock4(codesT: Array[Byte], off0: Int, m: Int,
      lut0: Array[Int], lut1: Array[Int], lut2: Array[Int], lut3: Array[Int],
      sums: Array[Float]): Unit = {
    var a0 = FloatVector.zero(FS512); var a1 = FloatVector.zero(FS512)
    var a2 = FloatVector.zero(FS512); var a3 = FloatVector.zero(FS512)
    var off = off0
    var g16 = 0
    val end = off0 + (m << 4)
    while (off < end) {
      val idx = ByteVector.fromArray(BS128, codesT, off)
        .convertShape(VectorOperators.B2I, IS512, 0).asInstanceOf[IntVector]
      a0 = a0.add(idx.selectFrom(IntVector.fromArray(IS512, lut0, g16)).reinterpretAsFloats())
      a1 = a1.add(idx.selectFrom(IntVector.fromArray(IS512, lut1, g16)).reinterpretAsFloats())
      a2 = a2.add(idx.selectFrom(IntVector.fromArray(IS512, lut2, g16)).reinterpretAsFloats())
      a3 = a3.add(idx.selectFrom(IntVector.fromArray(IS512, lut3, g16)).reinterpretAsFloats())
      g16 += 16; off += 16
    }
    a0.intoArray(sums, 0); a1.intoArray(sums, 16)
    a2.intoArray(sums, 32); a3.intoArray(sums, 48)
  }

  /** One 16-row block × 1 query (tail of a query batch; also the per-node
    * sub-block scorer of the neighbor-blocked graph walk — `outOff` places
    * the 16 sums for sub-block lanes 16s..16s+15). */
  def adcBlock1(codesT: Array[Byte], off0: Int, m: Int,
      lut0: Array[Int], sums: Array[Float], outOff: Int = 0): Unit = {
    var a0 = FloatVector.zero(FS512)
    var off = off0
    var g16 = 0
    val end = off0 + (m << 4)
    while (off < end) {
      val idx = ByteVector.fromArray(BS128, codesT, off)
        .convertShape(VectorOperators.B2I, IS512, 0).asInstanceOf[IntVector]
      a0 = a0.add(idx.selectFrom(IntVector.fromArray(IS512, lut0, g16)).reinterpretAsFloats())
      g16 += 16; off += 16
    }
    a0.intoArray(sums, outOff)
  }
}
