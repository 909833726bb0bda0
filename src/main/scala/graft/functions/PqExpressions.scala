package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernel shared by the PQ expressions: the group
  * layout, nearest-centroid-per-group, and nibble packing replicate
  * `/root/reference/src/distance/pq_table.rs` exactly (front-loaded
  * `div_ceil` groups at `38-53`, lo-nibble-first packing at `66-91`).
  */
object PqKernel {

  /** F7 — split `dim` into `m` contiguous ranges, front-loading the larger
    * `div_ceil` sizes. Returns (start, length) pairs. */
  def pqGroups(dim: Int, m: Int): Array[(Int, Int)] = {
    require(dim > 0, "dim must be greater than 0 in PQ")
    require(m > 0, "m must be greater than 0 in PQ")
    require(dim >= m, "dim must be >= m in PQ")
    val out = Array.newBuilder[(Int, Int)]
    var current = 0
    var g = 0
    while (current < dim) {
      val groupSize = (dim - current + (m - g) - 1) / (m - g) // div_ceil
      out += ((current, groupSize))
      current += groupSize
      g += 1
    }
    out.result()
  }

  /** Driver-side F9 — per-query ADC lookup table over a plain float array,
    * same math as the `PqLookup` expression (`pq_table.rs:195-224`). */
  def buildLookup(
      qv: Array[Float],
      centroids: Array[Array[Array[Float]]],
      nBits: Int,
      kind: String): Array[Double] = {
    val m = centroids.length
    val k = 1 << nBits
    val dim = qv.length
    val groups = pqGroups(dim, m)
    val out = new Array[Double](m * k)
    var g = 0
    while (g < m) {
      val (start, len) = groups(g)
      val cents = centroids(g)
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0
        var i = 0
        if (kind == "cosine") {
          while (i < len) { acc += qv(start + i).toDouble * cent(i); i += 1 }
        } else {
          while (i < len) {
            val d = qv(start + i).toDouble - cent(i); acc += d * d; i += 1
          }
        }
        out(g * k + c) = acc
        c += 1
      }
      g += 1
    }
    out
  }

  /** Driver/executor-side F10 — ADC distance from a packed code, same math
    * as the `PqAdcDistance` expression (`pq_table.rs:239-301`). `qn` is the
    * query norm (cosine only). */
  def adcScore(
      code: Array[Byte],
      lookup: Array[Double],
      centDot: Array[Double],
      nBits: Int,
      m: Int,
      cosine: Boolean,
      qn: Double): Double = {
    val k = 1 << nBits
    var sum = 0.0
    var cd = 0.0
    if (nBits == 4) {
      var i = 0
      var b = 0
      while (b < code.length) {
        val u = code(b) & 0xff
        if (i < m) {
          val idx = u & 0xf
          sum += lookup(i * k + idx); if (cosine) cd += centDot(i * k + idx)
        }
        i += 1
        if (i < m) {
          val idx = u >> 4
          sum += lookup(i * k + idx); if (cosine) cd += centDot(i * k + idx)
        }
        i += 1
        b += 1
      }
    } else {
      var i = 0
      while (i < m) {
        val idx = code(i) & 0xff
        sum += lookup(i * k + idx); if (cosine) cd += centDot(i * k + idx)
        i += 1
      }
    }
    if (cosine) 1.0 - sum / math.max(math.sqrt(cd) * qn, 1e-10) else sum
  }

  /** Unpack a packed code into one byte per group at `out[off..off+m)` —
    * done ONCE per partition chunk so the ADC scan reads group ids with no
    * per-pair shift/mask/branch work (4-bit: lo nibble first, matching
    * `pq_table.rs:66-91`). */
  def decodeInto(code: Array[Byte], m: Int, nBits: Int, out: Array[Byte], off: Int): Unit = {
    if (nBits == 4) {
      var i = 0
      var b = 0
      while (i < m) {
        val u = code(b) & 0xff
        out(off + i) = (u & 0xf).toByte
        i += 1
        if (i < m) { out(off + i) = (u >> 4).toByte; i += 1 }
        b += 1
      }
    } else {
      System.arraycopy(code, 0, out, off, m)
    }
  }

  /** Blocked ADC scan over a decoded-code chunk: scores `nRows` rows against
    * up to 4 queries at once (shared code-byte decode, 4 independent
    * accumulators → the lookup loads issue in parallel), maintaining each
    * query's bounded ascending (distance, id) top-ef buffer in place.
    * This is the serving hot loop — the per-(row, query) cost is one lookup
    * add, like the reference's in-memory ADC scan
    * (`/root/reference/src/index_algorithm/flat_index.rs:84-104`).
    *
    * `luts` are float (selection-grade, like the float traversal tier of
    * HNSW); winners are exact re-ranked downstream. `cdRow` is the per-row
    * centroid self-dot sum (cosine only; null for L2).
    */
  def adcScanChunk(
      codes: Array[Byte], nRows: Int, m: Int, k: Int,
      luts: Array[Array[Float]], q0: Int, qn: Int,
      cosine: Boolean, cdRow: Array[Double], qNorms: Array[Double],
      ids: Array[Long],
      bufD: Array[Array[Double]], bufI: Array[Array[Long]], sz: Array[Int],
      efK: Int): Unit = {
    var qb = q0
    val qEnd = q0 + qn
    while (qb + 4 <= qEnd) {
      val lut0 = luts(qb); val lut1 = luts(qb + 1)
      val lut2 = luts(qb + 2); val lut3 = luts(qb + 3)
      var r = 0
      while (r < nRows) {
        val base = r * m
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
        var g = 0
        var gk = 0
        while (g < m) {
          val idx = gk + (codes(base + g) & 0xff)
          s0 += lut0(idx); s1 += lut1(idx); s2 += lut2(idx); s3 += lut3(idx)
          g += 1; gk += k
        }
        if (cosine) {
          val cn = math.sqrt(cdRow(r))
          s0 = 1.0 - s0 / math.max(cn * qNorms(qb), 1e-10)
          s1 = 1.0 - s1 / math.max(cn * qNorms(qb + 1), 1e-10)
          s2 = 1.0 - s2 / math.max(cn * qNorms(qb + 2), 1e-10)
          s3 = 1.0 - s3 / math.max(cn * qNorms(qb + 3), 1e-10)
        }
        val id = ids(r)
        insertTopEf(bufD(qb), bufI(qb), sz, qb, id, s0, efK)
        insertTopEf(bufD(qb + 1), bufI(qb + 1), sz, qb + 1, id, s1, efK)
        insertTopEf(bufD(qb + 2), bufI(qb + 2), sz, qb + 2, id, s2, efK)
        insertTopEf(bufD(qb + 3), bufI(qb + 3), sz, qb + 3, id, s3, efK)
        r += 1
      }
      qb += 4
    }
    while (qb < qEnd) {
      val lut = luts(qb)
      var r = 0
      while (r < nRows) {
        val base = r * m
        var s = 0.0
        var g = 0
        var gk = 0
        while (g < m) {
          s += lut(gk + (codes(base + g) & 0xff))
          g += 1; gk += k
        }
        if (cosine)
          s = 1.0 - s / math.max(math.sqrt(cdRow(r)) * qNorms(qb), 1e-10)
        insertTopEf(bufD(qb), bufI(qb), sz, qb, ids(r), s, efK)
        r += 1
      }
      qb += 1
    }
  }

  /** Whether [[adcScanChunkFast]] applies: 4-bit codes (16 centroids per
    * group — the LUT-in-one-register condition) on 512-bit-preferred
    * hardware. */
  def fastScanEligible(k: Int): Boolean = k == 16 && graft.index.Simd.fastScan16

  /** A group-major float LUT as raw bits (`IntVector` loads want
    * `Array[Int]`) — the query-side half of the fast-scan contract. */
  def lutBits(lut: Array[Float]): Array[Int] = {
    val out = new Array[Int](lut.length)
    var i = 0
    while (i < lut.length) { out(i) = java.lang.Float.floatToRawIntBits(lut(i)); i += 1 }
    out
  }

  /** Transpose a decoded row-major code matrix (nRows × m) into 16-row
    * blocks, group-major within each block:
    * `out(block*m*16 + g*16 + lane) = codes((block*16+lane)*m + g)`.
    * Lanes past nRows in the last block stay 0 (callers skip them by row
    * bound, and code 0 is a valid index so the permute never faults). */
  def transposeCodes16(codes: Array[Byte], nRows: Int, m: Int): Array[Byte] = {
    val out = new Array[Byte](((nRows + 15) >> 4) * m * 16)
    transposeCodes16Into(codes, nRows, m, out)
    out
  }

  /** [[transposeCodes16]] into a caller-owned buffer (chunked scans reuse
    * one buffer across chunks; stale lanes past nRows are never read — and
    * are old 0–15 codes, so the permute stays in-range regardless). */
  def transposeCodes16Into(
      codes: Array[Byte], nRows: Int, m: Int, out: Array[Byte]): Unit = {
    var r = 0
    while (r < nRows) {
      val dst = ((r >> 4) * m << 4) + (r & 15)
      val src = r * m
      var g = 0
      while (g < m) { out(dst + (g << 4)) = codes(src + g); g += 1 }
      r += 1
    }
  }

  /** [[adcScanChunk]] over the 16-row-blocked transposed layout
    * ([[transposeCodes16]]), k = 16 only: the inner loop is
    * `Simd.adcBlock4`'s in-register permute — one instruction per
    * (group, 16 rows) instead of one subscripted load per (group, row).
    * Same contract and same top-ef maintenance as the scalar chunk scan;
    * sums accumulate in float vector lanes (selection-grade — the exact
    * re-rank downstream is unchanged). `lutsBits` are the queries' LUTs
    * pre-converted with [[lutBits]] ONCE per batch — chunked callers invoke
    * this per chunk, and re-deriving m·16 ints per (query, chunk) was
    * measurable allocation churn. */
  def adcScanChunkFast(
      codesT: Array[Byte], nRows: Int, m: Int,
      lutsBits: Array[Array[Int]], q0: Int, qn: Int,
      cosine: Boolean, cdRow: Array[Double], qNorms: Array[Double],
      ids: Array[Long],
      bufD: Array[Array[Double]], bufI: Array[Array[Long]], sz: Array[Int],
      efK: Int): Unit = {
    val nBlocks = (nRows + 15) >> 4
    val blockStride = m << 4
    val sums = new Array[Float](64)
    var qb = q0
    val qEnd = q0 + qn
    while (qb + 4 <= qEnd) {
      val l0 = lutsBits(qb); val l1 = lutsBits(qb + 1)
      val l2 = lutsBits(qb + 2); val l3 = lutsBits(qb + 3)
      var b = 0
      while (b < nBlocks) {
        graft.index.Simd.adcBlock4(codesT, b * blockStride, m, l0, l1, l2, l3, sums)
        val r0 = b << 4
        val lanes = math.min(16, nRows - r0)
        var lane = 0
        while (lane < lanes) {
          val r = r0 + lane
          val id = ids(r)
          var s0 = sums(lane).toDouble; var s1 = sums(16 + lane).toDouble
          var s2 = sums(32 + lane).toDouble; var s3 = sums(48 + lane).toDouble
          if (cosine) {
            val cn = math.sqrt(cdRow(r))
            s0 = 1.0 - s0 / math.max(cn * qNorms(qb), 1e-10)
            s1 = 1.0 - s1 / math.max(cn * qNorms(qb + 1), 1e-10)
            s2 = 1.0 - s2 / math.max(cn * qNorms(qb + 2), 1e-10)
            s3 = 1.0 - s3 / math.max(cn * qNorms(qb + 3), 1e-10)
          }
          insertTopEf(bufD(qb), bufI(qb), sz, qb, id, s0, efK)
          insertTopEf(bufD(qb + 1), bufI(qb + 1), sz, qb + 1, id, s1, efK)
          insertTopEf(bufD(qb + 2), bufI(qb + 2), sz, qb + 2, id, s2, efK)
          insertTopEf(bufD(qb + 3), bufI(qb + 3), sz, qb + 3, id, s3, efK)
          lane += 1
        }
        b += 1
      }
      qb += 4
    }
    while (qb < qEnd) {
      val l0 = lutsBits(qb)
      var b = 0
      while (b < nBlocks) {
        graft.index.Simd.adcBlock1(codesT, b * blockStride, m, l0, sums)
        val r0 = b << 4
        val lanes = math.min(16, nRows - r0)
        var lane = 0
        while (lane < lanes) {
          val r = r0 + lane
          var s = sums(lane).toDouble
          if (cosine)
            s = 1.0 - s / math.max(math.sqrt(cdRow(r)) * qNorms(qb), 1e-10)
          insertTopEf(bufD(qb), bufI(qb), sz, qb, ids(r), s, efK)
          lane += 1
        }
        b += 1
      }
      qb += 1
    }
  }

  /** Single-row ADC lookup sum over a decoded code-matrix row (row starts
    * at `base`, one byte per group, lut laid out group-major `g*k + c`).
    * Four independent accumulators: a single dependent-add chain is
    * latency-bound (~4-5 cycles per lookup), which measured the HNSW+PQ
    * combined walk SLOWER than plain HNSW's SIMD exact distances at m=320 —
    * the hot kernel of the graph walk's ADC `distFn`. */
  def adcOne(codes: Array[Byte], base: Int, m: Int, k: Int,
      lut: Array[Float]): Double = {
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var g = 0
    var gk = 0
    val lim = m - 3
    while (g < lim) {
      s0 += lut(gk + (codes(base + g) & 0xff))
      s1 += lut(gk + k + (codes(base + g + 1) & 0xff))
      s2 += lut(gk + 2 * k + (codes(base + g + 2) & 0xff))
      s3 += lut(gk + 3 * k + (codes(base + g + 3) & 0xff))
      g += 4; gk += 4 * k
    }
    var s = (s0 + s1) + (s2 + s3)
    while (g < m) { s += lut(gk + (codes(base + g) & 0xff)); g += 1; gk += k }
    s
  }

  /** Bounded ascending (distance, id) insert — O(1) reject once full. */
  @inline private def insertTopEf(
      ds: Array[Double], idArr: Array[Long], sz: Array[Int], qi: Int,
      id: Long, d: Double, efK: Int): Unit = {
    val n = sz(qi)
    if (n == efK && (d > ds(n - 1) || (d == ds(n - 1) && id >= idArr(n - 1)))) return
    val mm = if (n < efK) n else n - 1
    var lo = 0; var hi = mm
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (d < ds(mid) || (d == ds(mid) && id < idArr(mid))) hi = mid
      else lo = mid + 1
    }
    System.arraycopy(ds, lo, ds, lo + 1, mm - lo)
    System.arraycopy(idArr, lo, idArr, lo + 1, mm - lo)
    ds(lo) = d; idArr(lo) = id
    if (n < efK) sz(qi) = n + 1
  }

  /** [[nearestInGroup]] over a plain float array (serving-side encode —
    * no ArrayData wrapper). Same math, same tie-break. */
  def nearestInGroupF(
      v: Array[Float], start: Int, len: Int,
      cents: Array[Array[Float]], cosine: Boolean): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var i = 0
      if (cosine) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        while (i < len) {
          val x = v(start + i).toDouble
          dot += x * cent(i); na += x * x; nb += cent(i).toDouble * cent(i)
          i += 1
        }
        d = 1.0 - dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
      } else {
        while (i < len) {
          val diff = v(start + i).toDouble - cent(i); d += diff * diff; i += 1
        }
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** F8 over a plain float array, emitting the DECODED form (one byte per
    * group) straight into `out[off..off+m)` — the serving-side encode used
    * to align a code matrix with graph-local node indices. Produces exactly
    * the codes [[decodeInto]] recovers from the stored packed column (the
    * encoder is deterministic), skipping the id-join. */
  def encodeDecodedInto(
      v: Array[Float], centroids: Array[Array[Array[Float]]],
      groups: Array[(Int, Int)], cosine: Boolean,
      out: Array[Byte], off: Int): Unit = {
    var g = 0
    while (g < groups.length) {
      val (start, len) = groups(g)
      out(off + g) = nearestInGroupF(v, start, len, centroids(g), cosine).toByte
      g += 1
    }
  }

  /** Nearest centroid of a vector slice (ties → lowest id) under the
    * table's configured metric — the reference encodes with
    * `KMeans::find_nearest`, which uses `config.dist`
    * (`/root/reference/src/distance/k_means.rs:166-170`), so cosine tables
    * assign codes by cosine over the slice (1e-10 clamp), not L2. */
  def nearestInGroup(
      v: ArrayData, isFloat: Boolean, start: Int, len: Int,
      cents: Array[Array[Float]], cosine: Boolean): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var i = 0
      if (cosine) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        while (i < len) {
          val x = if (isFloat) v.getFloat(start + i).toDouble else v.getDouble(start + i)
          dot += x * cent(i); na += x * x; nb += cent(i).toDouble * cent(i)
          i += 1
        }
        d = 1.0 - dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
      } else {
        while (i < len) {
          val x = if (isFloat) v.getFloat(start + i).toDouble else v.getDouble(start + i)
          val diff = x - cent(i); d += diff * diff; i += 1
        }
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

/** F8 — PQ encode: per group, the nearest-centroid id; 4-bit packs two ids
  * per byte (low nibble first), 8-bit one per byte
  * (`/root/reference/src/distance/pq_table.rs:66-91`). Output is a
  * fixed-width binary column of `ceil(m·n_bits/8)` bytes.
  */
case class PqEncode(
    child: Expression,
    centroids: Array[Array[Array[Float]]], // (group)(centroidId)(sliceDim)
    nBits: Int,
    dim: Int,
    dist: String = "l2sqr")
  extends UnaryExpression with CodegenFallback {

  require(nBits == 4 || nBits == 8, "n_bits must be 4 or 8 in PQ")

  private val m = centroids.length
  private val cosine = dist == "cosine"
  private lazy val groups = PqKernel.pqGroups(dim, m)

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>/array<double>, got ${other.catalogString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == dim,
      s"pq_encode: dimension mismatch (${v.numElements()} vs $dim)")
    if (nBits == 4) {
      val out = new Array[Byte]((m + 1) / 2)
      var i = 0
      while (i < m / 2) {
        val (s0, l0) = groups(2 * i)
        val (s1, l1) = groups(2 * i + 1)
        val v0 = PqKernel.nearestInGroup(v, isFloat, s0, l0, centroids(2 * i), cosine)
        val v1 = PqKernel.nearestInGroup(v, isFloat, s1, l1, centroids(2 * i + 1), cosine)
        out(i) = (v0 | (v1 << 4)).toByte
        i += 1
      }
      if (m % 2 == 1) {
        val (s, l) = groups(m - 1)
        out(m / 2) = PqKernel.nearestInGroup(v, isFloat, s, l, centroids(m - 1), cosine).toByte
      }
      out
    } else {
      val out = new Array[Byte](m)
      var i = 0
      while (i < m) {
        val (s, l) = groups(i)
        out(i) = PqKernel.nearestInGroup(v, isFloat, s, l, centroids(i), cosine).toByte
        i += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** F9 — per-query ADC lookup table: for each group i and centroid c, the
  * partial L2Sqr (or dot product for cosine) between the query's slice and
  * the centroid, flattened to `m·k` entries at `i·k + c`
  * (`/root/reference/src/distance/pq_table.rs:195-224`). Computed as a
  * column on the (small, broadcast) query side, so ADC scoring needs no
  * driver-side per-query state. */
case class PqLookup(
    child: Expression,
    centroids: Array[Array[Array[Float]]],
    nBits: Int,
    dim: Int,
    kind: String)
  extends UnaryExpression with CodegenFallback {

  private val m = centroids.length
  private val k = 1 << nBits
  private lazy val groups = PqKernel.pqGroups(dim, m)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lookup requires array<float>/array<double>, got ${other.catalogString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == dim,
      s"pq_lookup: dimension mismatch (${v.numElements()} vs $dim)")
    val out = new Array[Double](m * k)
    var g = 0
    while (g < m) {
      val (start, len) = groups(g)
      val cents = centroids(g)
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0
        var i = 0
        if (kind == "cosine") {
          while (i < len) {
            val x = if (isFloat) v.getFloat(start + i).toDouble else v.getDouble(start + i)
            acc += x * cent(i); i += 1
          }
        } else {
          while (i < len) {
            val x = if (isFloat) v.getFloat(start + i).toDouble else v.getDouble(start + i)
            val d = x - cent(i); acc += d * d; i += 1
          }
        }
        out(g * k + c) = acc
        c += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_lookup"
}

/** F10 — ADC distance: sum of lookup entries indexed by the code's nibbles
  * (low nibble first); cosine re-derives
  * `1 − sum / max(√(Σ c·c) · ‖query‖, 1e-10)` using the model's cached
  * per-centroid self-dot products
  * (`/root/reference/src/distance/pq_table.rs:239-301`).
  *
  * Children: (code: binary, lookup: array<double>, queryNorm: double —
  * ignored for L2Sqr).
  */
case class PqAdcDistance(
    first: Expression,  // code
    second: Expression, // lookup
    third: Expression,  // query norm (cosine) or literal 0.0
    centroidDotCache: Array[Double], // m·k, zeros for L2Sqr
    nBits: Int,
    m: Int,
    kind: String)
  extends TernaryExpression {

  private val k = 1 << nBits

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (binary, array<double>, double), got $other")
    }

  override def nullSafeEval(codeAny: Any, lookupAny: Any, normAny: Any): Any = {
    val code = codeAny.asInstanceOf[Array[Byte]]
    val lookup = lookupAny.asInstanceOf[ArrayData]
    var sum = 0.0
    var centDot = 0.0
    if (nBits == 4) {
      var i = 0
      var b = 0
      while (b < code.length) {
        val u = code(b) & 0xff
        if (i < m) {
          val idx = u & 0xf
          sum += lookup.getDouble(i * k + idx)
          if (kind == "cosine") centDot += centroidDotCache(i * k + idx)
        }
        i += 1
        if (i < m) {
          val idx = u >> 4
          sum += lookup.getDouble(i * k + idx)
          if (kind == "cosine") centDot += centroidDotCache(i * k + idx)
        }
        i += 1
        b += 1
      }
    } else {
      var i = 0
      while (i < m) {
        val idx = code(i) & 0xff
        sum += lookup.getDouble(i * k + idx)
        if (kind == "cosine") centDot += centroidDotCache(i * k + idx)
        i += 1
      }
    }
    if (kind == "cosine") {
      val norm0 = math.sqrt(centDot)
      val norm1 = normAny.asInstanceOf[Double]
      1.0 - sum / math.max(norm0 * norm1, 1e-10)
    } else sum
  }

  /** The ADC sum is the per-candidate hot loop of a PQ scan (evaluated N·Q
    * times) — codegen keeps it inside whole-stage codegen like the raw
    * distance expression, instead of per-row interpreted eval. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cacheRef =
      if (kind == "cosine") ctx.addReferenceObj("centDotCache", centroidDotCache, "double[]")
      else null
    nullSafeCodeGen(ctx, ev, (code, lookup, norm) => {
      val sum = ctx.freshName("sum")
      val cd = ctx.freshName("cd")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val u = ctx.freshName("u")
      val idx = ctx.freshName("idx")
      val accumulate = (idxExpr: String) =>
        s"""int $idx = $idxExpr;
           |$sum += $lookup.getDouble($i * $k + $idx);
           |${if (kind == "cosine") s"$cd += $cacheRef[$i * $k + $idx];" else ""}""".stripMargin
      val body =
        if (nBits == 4)
          s"""int $i = 0;
             |for (int $b = 0; $b < $code.length; $b++) {
             |  int $u = $code[$b] & 0xff;
             |  if ($i < $m) { ${accumulate(s"$u & 0xf")} }
             |  $i++;
             |  if ($i < $m) { ${accumulate(s"$u >> 4")} }
             |  $i++;
             |}""".stripMargin
        else
          s"""for (int $i = 0; $i < $m; $i++) {
             |  ${accumulate(s"$code[$i] & 0xff")}
             |}""".stripMargin
      val finish =
        if (kind == "cosine")
          s"${ev.value} = 1.0 - $sum / Math.max(Math.sqrt($cd) * $norm, 1e-10);"
        else s"${ev.value} = $sum;"
      s"""double $sum = 0.0;
         |double $cd = 0.0;
         |$body
         |$finish""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "pq_adc_distance"
}
