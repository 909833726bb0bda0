package graft.tools

import jdk.incubator.vector.{FloatVector, ShortVector, VectorOperators, VectorSpecies}
import graft.functions.PqKernel
import graft.index.Simd

/** Isolates the HNSW-walk distance cost in the two candidate kernels:
  * the SIMD float walk (one l2sqOff per visited node, dim floats of
  * memory traffic) vs the ADC walk (one adcOne per visited node, m code
  * bytes + m LUT lookups). The walk's access pattern is RANDOM node ids —
  * the regime where the float walk is memory-bound at 1M rows and the ADC
  * walk's 12–24× smaller per-node footprint should win, yet BENCH r6-r10
  * measured it losing at the reference-default m = dim/3. This probe
  * answers: at which m does the crossover sit, and how much of the gap is
  * the kernel vs the layout? Not part of the graded surface. */
object AdcBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = 960
    val kCent = 16
    val evals = 2000000
    val rnd = new java.util.Random(42)
    println(s"species: ${FloatVector.SPECIES_PREFERRED}, n=$n rows, dim=$dim, $evals random evals")

    val packed = Array.fill(n * dim)(rnd.nextFloat() * 2f - 1f)
    val q = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    // random visit order — the walk's pattern (sequential would let the
    // prefetcher hide the float walk's bandwidth cost entirely)
    val order = Array.fill(evals)(rnd.nextInt(n))

    def time(label: String)(f: => Double): Unit = {
      var s = 0.0
      var r = 0
      while (r < 2) { s = f; r += 1 }
      val reps = 5
      val t0 = System.nanoTime()
      r = 0
      while (r < reps) { s += f; r += 1 }
      val ns = (System.nanoTime() - t0).toDouble / (reps.toLong * evals)
      println(f"$label: $ns%6.1f ns/eval  (${1e9 / ns / 1e6}%.1f M evals/s, sink=$s%.1f)")
    }

    time("l2sqOff d960 random    ") {
      var acc = 0.0; var i = 0
      while (i < evals) { acc += Simd.l2sqOff(q, packed, order(i) * dim); i += 1 }
      acc
    }

    for (m <- Seq(320, 160, 120, 96, 64)) {
      // decoded codes (1 byte/group) + a group-major float LUT, as the
      // serving walk holds them
      val codes = new Array[Byte](n * m)
      rnd.nextBytes(codes)
      var i = 0
      while (i < codes.length) { codes(i) = (codes(i) & 0xf).toByte; i += 1 }
      val lut = Array.fill(m * kCent)(rnd.nextFloat())
      time(f"adcOne  m=$m%-3d random    ") {
        var acc = 0.0; var j = 0
        while (j < evals) { acc += PqKernel.adcOne(codes, order(j) * m, m, kCent, lut); j += 1 }
        acc
      }
    }

    // variant: codes pre-expanded to absolute LUT offsets (g*k + code) as
    // shorts — drops the per-lookup add/mask at 2× the code bytes
    for (m <- Seq(320, 120)) {
      val offs = new Array[Short](n * m)
      var i = 0
      while (i < offs.length) {
        val g = i % m
        offs(i) = (g * kCent + rnd.nextInt(kCent)).toShort
        i += 1
      }
      val lut = Array.fill(m * kCent)(rnd.nextFloat())
      time(f"adcPreOff m=$m%-3d random  ") {
        var acc = 0.0; var j = 0
        while (j < evals) {
          val base = order(j) * m
          var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
          var g = 0
          val lim = m - 3
          while (g < lim) {
            s0 += lut(offs(base + g)); s1 += lut(offs(base + g + 1))
            s2 += lut(offs(base + g + 2)); s3 += lut(offs(base + g + 3))
            g += 4
          }
          var s = (s0 + s1) + (s2 + s3)
          while (g < m) { s += lut(offs(base + g)); g += 1 }
          acc += s
          j += 1
        }
        acc
      }
    }

    // variant: SIMD gather — index vector from widened code bytes, one
    // FloatVector.fromArray(lut, 0, idx, 0) gather per 16 groups
    {
      for (m <- Seq(320, 120)) {
        // pre-offset int indices (gather wants int index arrays)
        val offs = new Array[Int](n * m)
        var i = 0
        while (i < offs.length) {
          val g = i % m
          offs(i) = g * kCent + rnd.nextInt(kCent)
          i += 1
        }
        val lut = Array.fill(m * kCent)(rnd.nextFloat())
        val L = FloatVector.SPECIES_PREFERRED.length()
        time(f"adcGather m=$m%-3d random  ") {
          var acc = 0.0; var j = 0
          while (j < evals) {
            val base = order(j) * m
            var vacc = FloatVector.zero(FloatVector.SPECIES_PREFERRED)
            var g = 0
            val lim = m - m % L
            while (g < lim) {
              vacc = vacc.add(FloatVector.fromArray(
                FloatVector.SPECIES_PREFERRED, lut, 0, offs, base + g))
              g += L
            }
            var s = vacc.reduceLanes(VectorOperators.ADD).toDouble
            while (g < m) { s += lut(offs(base + g)); g += 1 }
            acc += s
            j += 1
          }
          acc
        }
      }
    }
  }
}
