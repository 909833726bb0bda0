package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** 64-bit SimHash sketch of a token-hash array, in one pass.
  *
  * Bit b of the sketch is set iff strictly more than half of the token
  * hashes have bit b set (ties → 0) — identical semantics to the
  * 64-×-`filter` column formulation it replaces, but each row is scanned
  * once with 64 counters instead of 64 times with an array allocation per
  * bit. Stays inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint> of token hashes, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) sketch |= (1L << b)
      b += 1
    }
    sketch
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val sketch = ctx.freshName("sketch")
      s"""int $n = $hs.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $sketch = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] * 2 > $n) $sketch |= (1L << $b);
         |}
         |${ev.value} = $sketch;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** All `numHashes` MinHash signature slots in one pass over the base-hash
  * array: slot h = min over elements x of floorMod(x·a(h) + b(h), prime) —
  * value-identical to the per-slot `array_min(transform(...))` column
  * formulation (Long arithmetic wraps the same way), without materializing
  * `numHashes` intermediate arrays per row. Null for an empty input (the
  * columnar form yields all-null slots; callers filter empty shingle sets).
  */
case class MinHashSignature(
    child: Expression,
    aCoeffs: Array[Long],
    bCoeffs: Array[Long],
    prime: Long)
  extends UnaryExpression {

  private val numHashes = aCoeffs.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint> of base hashes, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var h = 0
      while (h < numHashes) {
        val v = java.lang.Math.floorMod(x * aCoeffs(h) + bCoeffs(h), prime)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aCoeffs, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bCoeffs, "long[]")
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""int $n = $xs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $x = $xs.getLong($i);
         |    for (int $h = 0; $h < $numHashes; $h++) {
         |      long $v = java.lang.Math.floorMod($x * $aRef[$h] + $bRef[$h], ${prime}L);
         |      if ($v < $mins[$h]) $mins[$h] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

/** Winnowed document fingerprints (MOSS — Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003) in one pass per row: Rabin–Karp polynomial hashes over
  * Unicode-codepoint k-grams (base 257, mod 1e9+7, mod per step), then the
  * minimum of every window of w consecutive gram hashes, deduplicated.
  * Returns the distinct selected hashes as `array<bigint>` (empty when the
  * string has fewer than k + w − 1 codepoints — no full window exists).
  *
  * Codepoint semantics (not UTF-16 units, not bytes) match both Spark's
  * `length()` and DuckDB's `substr`/`ascii`, so the q_doc_fingerprint
  * oracle refolds the identical arithmetic. A tight per-row loop as a
  * native expression: the nested higher-order-function formulation runs
  * interpreted with per-element subtree re-evaluation (measured: minutes
  * over 500 short docs vs milliseconds here). Interpreted eval only
  * (CodegenFallback) — the row cost is the O(L·k) fold itself, not
  * expression dispatch. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1 && w >= 1, "winnow_fingerprints: k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires string, got ${other.catalogString}")
  }

  private val B = 257L
  private val M = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.codePoints().toArray
    val L = cps.length
    val nGrams = L - k + 1
    val nWins = nGrams - w + 1
    if (nWins <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * B + cps(i + j)) % M; j += 1 }
      hs(i) = acc
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var p = 0
    while (p < nWins) {
      var mn = hs(p)
      var q = p + 1
      while (q < p + w) { if (hs(q) < mn) mn = hs(q); q += 1 }
      seen.add(mn)
      p += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

/** Distinct 64-bit word n-gram hashes of a text column in one pass per row
  * — the MinHash-LSH shingle stage ([[graft.operators.Dedup.minhashLshJoin]])
  * without ever materializing a shingle string OR a token-hash array.
  *
  * Semantics are bit-identical to the declarative
  * `Dedup.hashedShingles(transform(split(text, " "), xxhash64), n)`:
  * tokens split on every single 0x20 byte (empties kept, like Spark's
  * `split(text, " ")` — safe on UTF-8, 0x20 never occurs in a multi-byte
  * sequence), each token hashed with Spark's XXH64 (seed 42, the xxhash64
  * default), each window of n token hashes chained through
  * `XXH64.hashLong` exactly as the n-ary `xxhash64(t0, …, tn-1)` would,
  * first-occurrence order preserved like `array_distinct`. DedupSpec locks
  * this equivalence.
  *
  * A native expression because the declarative form pays 2-3× in
  * HigherOrderFunction plumbing (measured at 100k×60 words: 5.1 s vs
  * 1.9 s for even the string-shingle build; the per-element lambda +
  * `element_at` dispatch dominates). Interpreted eval only
  * (CodegenFallback) — the row cost is the O(tokens·n) fold itself. */
case class NgramHashes(child: Expression, n: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, "ngram_hashes: n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // token hashes: split on every 0x20 (empty tokens kept — split(" ")
    // regex semantics), hash the byte slice with the xxhash64 default seed
    var nTok = 1
    var i = 0
    while (i < len) { if (s.getByte(i) == 0x20) nTok += 1; i += 1 }
    if (nTok < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val th = new Array[Long](nTok)
    var t = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || s.getByte(i) == 0x20) {
        th(t) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        t += 1
        start = i + 1
      }
      i += 1
    }
    // window mix: xxhash64(t_w, …, t_w+n-1) = left-to-right hashLong chain
    val nWin = nTok - n + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w < nWin) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(w + j), h); j += 1 }
      seen.add(h)
      w += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_hashes"
}

/** Single-pass repetition statistics over a text column — the
  * Gopher/MassiveText repetition quality signals (Rae et al. 2021, §A1.1)
  * in the exact shapes the n-gram rules take there:
  *
  *   out[0] = top 2-gram fraction: occurrences of the most frequent word
  *            2-gram ÷ total 2-gram windows (0.0 when < 2 tokens);
  *   out[1] = duplicate 3-gram fraction: windows whose 3-gram occurs ≥ 2
  *            times ÷ total 3-gram windows (0.0 when < 3 tokens).
  *
  * Tokenization and window hashing are byte-identical to [[NgramHashes]]
  * (0x20 split with empties kept, XXH64 token hashes, left-to-right
  * hashLong window chain), so the DuckDB oracle's literal-string n-gram
  * counts match unless 64-bit hashes collide within one document —
  * vanishingly unlikely and loudly caught by the oracle hash compare.
  *
  * Zero-shuffle by construction: the alternative explode → groupBy(doc,
  * gram) → window-max formulation shuffles every n-gram occurrence of the
  * corpus; this is a per-row kernel with one small open-addressed count
  * table, embarrassingly parallel at 100 TB.
  */
case class RepetitionStats(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires string, got ${other.catalogString}")
  }

  /** Open-addressed long→count insert-or-increment; returns the new count.
    * Capacity is 2× the max insert count rounded up to a power of two, so
    * load factor stays ≤ 0.5 and probes are short. Key 0 is remapped (an
    * XXH64 output of 0 is one specific 64-bit value; remapping merges it
    * with the remap target at ~2⁻⁶⁴ odds — the same collision class the
    * hashing itself accepts). */
  /** Open-table capacity for `nWin` inserts: 2× rounded up to a power of
    * two, computed in LONG arithmetic (an int `nWin * 2` overflows negative
    * at ≥2^30 windows, leaving cap at 4 and [[bump]] in an infinite probe
    * loop once the 4-slot table fills — a hang on pathological ~1 GB single
    * documents). Capped at 2^30 slots; callers switch to a HashMap before
    * the cap can saturate ([[MapFallbackWindows]]). */
  private def tableCap(nWin: Int): Int = {
    var cap = 4
    val need = math.min(nWin.toLong * 2, 1L << 30)
    while (cap < need) cap <<= 1
    cap
  }

  /** Windows-per-doc threshold past which the open table would exceed load
    * factor 0.5 at its 2^30-slot ceiling: such documents (≥2^29 n-gram
    * windows — a ≥1 GB single doc) count through a HashMap instead. The
    * open table must never run full: a full table turns [[bump]]'s probe
    * loop infinite. */
  private val MapFallbackWindows = 1 << 29

  private def bump(keys: Array[Long], counts: Array[Int], key0: Long): Int = {
    val key = if (key0 == 0L) 0x9E3779B97F4A7C15L else key0
    val mask = keys.length - 1
    var i = java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L) & mask
    while (true) {
      val k = keys(i)
      if (k == key) { counts(i) += 1; return counts(i) }
      if (k == 0L) { keys(i) = key; counts(i) = 1; return 1 }
      i = (i + 1) & mask
    }
    0 // unreachable
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    var nTok = 1
    var i = 0
    while (i < len) { if (s.getByte(i) == 0x20) nTok += 1; i += 1 }
    val th = new Array[Long](nTok)
    var t = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || s.getByte(i) == 0x20) {
        th(t) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        t += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Double](2)
    val nWin2 = nTok - 1
    if (nWin2 > 0) {
      var maxC = 0
      if (nWin2 >= MapFallbackWindows) {
        val map = new java.util.HashMap[java.lang.Long, Integer](1 << 20)
        var w = 0
        while (w < nWin2) {
          val h = XXH64.hashLong(th(w + 1), XXH64.hashLong(th(w), 42L))
          val c = map.merge(h, 1, (a, b) => a + b).intValue()
          if (c > maxC) maxC = c
          w += 1
        }
      } else {
        val cap = tableCap(nWin2)
        val keys = new Array[Long](cap)
        val counts = new Array[Int](cap)
        var w = 0
        while (w < nWin2) {
          val h = XXH64.hashLong(th(w + 1), XXH64.hashLong(th(w), 42L))
          val c = bump(keys, counts, h)
          if (c > maxC) maxC = c
          w += 1
        }
      }
      out(0) = maxC.toDouble / nWin2
    }
    val nWin3 = nTok - 2
    if (nWin3 > 0) {
      // windows in duplicated grams = Σ_{gram: c≥2} c — count every window
      // whose gram reaches 2, plus the first window retroactively when its
      // gram's count hits exactly 2
      var dup = 0
      if (nWin3 >= MapFallbackWindows) {
        val map = new java.util.HashMap[java.lang.Long, Integer](1 << 20)
        var w = 0
        while (w < nWin3) {
          val h = XXH64.hashLong(th(w + 2),
            XXH64.hashLong(th(w + 1), XXH64.hashLong(th(w), 42L)))
          val c = map.merge(h, 1, (a, b) => a + b).intValue()
          if (c == 2) dup += 2 else if (c > 2) dup += 1
          w += 1
        }
      } else {
        val cap = tableCap(nWin3)
        val keys = new Array[Long](cap)
        val counts = new Array[Int](cap)
        var w = 0
        while (w < nWin3) {
          val h = XXH64.hashLong(th(w + 2),
            XXH64.hashLong(th(w + 1), XXH64.hashLong(th(w), 42L)))
          val c = bump(keys, counts, h)
          if (c == 2) dup += 2 else if (c > 2) dup += 1
          w += 1
        }
      }
      out(1) = dup.toDouble / nWin3
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object TextFunctions {
  /** Single-pass 64-bit SimHash over an `array<bigint>` of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokenHashes)))

  /** Winnowed rolling-hash fingerprint set of a string column
    * ([[WinnowFingerprints]]). */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowFingerprints(ColumnShim.expression(text), k, w))

  /** Distinct 64-bit word n-gram hashes of a text column
    * ([[NgramHashes]]). */
  def ngramHashes(text: Column, n: Int): Column =
    ColumnShim.column(NgramHashes(ColumnShim.expression(text), n))

  /** Gopher-style repetition signals `[top2gram_frac, dup3gram_frac]`
    * ([[RepetitionStats]]). */
  def repetitionStats(text: Column): Column =
    ColumnShim.column(RepetitionStats(ColumnShim.expression(text)))

  /** Single-pass MinHash signature over an `array<bigint>` of base hashes. */
  def minhashSignature(
      baseHashes: Column, a: Array[Long], b: Array[Long], prime: Long): Column =
    ColumnShim.column(MinHashSignature(
      ColumnShim.expression(baseHashes), a, b, prime))
}
