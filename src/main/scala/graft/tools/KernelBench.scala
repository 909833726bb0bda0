package graft.tools

import jdk.incubator.vector.{FloatVector, VectorOperators}
import graft.index.Simd

/** Isolates the distance-kernel cost: SIMD vs scalar, pointer-chased rows vs
  * one packed matrix. Not part of the graded surface. */
object KernelBench {
  def scalarL2(a: Array[Float], b: Array[Float]): Float = {
    var s = 0f; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  def main(args: Array[String]): Unit = {
    println(s"species: ${FloatVector.SPECIES_PREFERRED}")
    val n = 10000; val dim = 960
    val rnd = new java.util.Random(42)
    val packed = Array.fill(n * dim)(rnd.nextFloat() * 2f - 1f)
    val rows = Array.tabulate(n)(i => java.util.Arrays.copyOfRange(packed, i * dim, (i + 1) * dim))
    val q = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)

    def time(label: String)(f: => Double): Unit = {
      var s = 0.0
      var r = 0
      while (r < 3) { s = f; r += 1 } // warm
      val t0 = System.nanoTime()
      var reps = 0
      while (reps < 20) { s += f; reps += 1 }
      val ns = (System.nanoTime() - t0).toDouble / (20L * n)
      println(f"$label: $ns%.1f ns/eval (sink=$s%.2f)")
    }

    time("scalar rows      ") { var acc = 0.0; var i = 0; while (i < n) { acc += scalarL2(q, rows(i)); i += 1 }; acc }
    time("simd l2sq rows   ") { var acc = 0.0; var i = 0; while (i < n) { acc += Simd.l2sq(q, rows(i)); i += 1 }; acc }
    time("simd l2sqOff pack") { var acc = 0.0; var i = 0; while (i < n) { acc += Simd.l2sqOff(q, packed, i * dim); i += 1 }; acc }
    // pure bandwidth probe: sum the matrix with SIMD (no second operand)
    val FS = FloatVector.SPECIES_PREFERRED
    time("simd sum packed  ") {
      var acc = FloatVector.zero(FS)
      var i = 0
      while (i < n * dim) { acc = acc.add(FloatVector.fromArray(FS, packed, i)); i += FS.length() }
      acc.reduceLanes(VectorOperators.ADD).toDouble
    }
  }
}
