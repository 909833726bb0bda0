package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.TopBuffer

/** [[TopBuffer]] invariants: both physical layouts (sorted insertion array
  * at k ≤ 256, loose quickselect buffer past it) keep EXACTLY the k
  * smallest elements under strict (distance, id) order — the selection
  * every quantized coarse kernel's tie-breaks ride on. */
class TopBufferSpec extends AnyFunSuite {

  private def oracle(xs: Seq[(Double, Long)], k: Int): Set[(Double, Long)] =
    xs.sortBy(identity).take(k).toSet

  private def drain(b: TopBuffer): Set[(Double, Long)] =
    (0 until b.size).map(p => (b.distAt(p), b.idAt(p))).toSet

  test("both layouts select the k smallest (distance, id) — randomized, with ties") {
    val rnd = new scala.util.Random(42)
    // k spans both layouts; duplicate distances force id tie-breaks
    for (k <- Seq(1, 3, 17, 256, 257, 500, 2000); trial <- 0 until 5) {
      val n = k / 2 + rnd.nextInt(3 * k + 10)
      val xs = (0 until n).map { i =>
        (rnd.nextInt(math.max(2, n / 4)).toDouble, i.toLong)
      }
      val buf = new TopBuffer(k)
      xs.foreach { case (d, id) => buf.offer(d, id) }
      assert(buf.size == math.min(k, n), s"k=$k trial=$trial size")
      assert(drain(buf) == oracle(xs, k), s"k=$k trial=$trial n=$n")
    }
  }

  test("bound: exact worst-kept (sorted layout); safe upper bound, exact after seal (loose)") {
    // sorted layout (k <= 256): exact at every step
    val k = 4
    val buf = new TopBuffer(k)
    (0 until k - 1).foreach(i => buf.offer(i.toDouble, i.toLong))
    assert(buf.bound.isPosInfinity)
    buf.offer((k - 1).toDouble, (k - 1).toLong)
    assert(buf.bound == (k - 1).toDouble)
    buf.offer(-1.0, 999L) // displaces the worst
    assert(buf.bound == (k - 2).toDouble)
    // loose layout (k > 256): the bound may lag (stale-looser is safe —
    // it only admits superset elements, never loses one) but is never
    // tighter than the true k-th, and is EXACT after any external read
    // (size seals via quickselect)
    val k2 = 300
    val b2 = new TopBuffer(k2)
    (0 until k2 - 1).foreach(i => b2.offer(i.toDouble, i.toLong))
    assert(b2.bound.isPosInfinity)
    b2.offer((k2 - 1).toDouble, (k2 - 1).toLong)
    assert(b2.bound >= (k2 - 1).toDouble)
    b2.offer(-1.0, 999L)
    b2.size // seal
    assert(b2.bound == (k2 - 2).toDouble)
  }

  test("equal-distance admission replaces only on smaller id") {
    for (k <- Seq(2, 300)) {
      val buf = new TopBuffer(k)
      // fill with distance 5.0, ids k..2k-1
      (0 until k).foreach(i => buf.offer(5.0, (k + i).toLong))
      buf.offer(5.0, 1L) // smaller id at the bound distance: admitted
      val kept = drain(buf)
      assert(kept.contains((5.0, 1L)), s"k=$k: (5.0, 1) not admitted")
      assert(!kept.contains((5.0, (2L * k) - 1)), s"k=$k: worst id survived")
      buf.offer(5.0, (3L * k)) // larger id at the bound: rejected
      assert(!drain(buf).contains((5.0, 3L * k)), s"k=$k: larger id admitted")
    }
  }

  test("ascending and descending feeds land on the same selection") {
    for (k <- Seq(10, 400)) {
      val n = 3 * k
      val up = new TopBuffer(k)
      (0 until n).foreach(i => up.offer(i.toDouble, i.toLong))
      val down = new TopBuffer(k)
      (n - 1 to 0 by -1).foreach(i => down.offer(i.toDouble, i.toLong))
      val want = (0 until k).map(i => (i.toDouble, i.toLong)).toSet
      assert(drain(up) == want, s"k=$k ascending")
      assert(drain(down) == want, s"k=$k descending")
    }
  }

  test("NaN admission while under-filled is identical across layouts") {
    // a NaN distance fails every comparison; both layouts must still admit
    // it while fewer than k are held (the sorted layout always did via its
    // n < k arm — the loose layout's bound test alone would reject it even
    // into an EMPTY buffer, silently changing selection between k <= 256
    // and k > 256 on NaN inputs, e.g. NaN vectors through the SQ kernel)
    for (k <- Seq(4, 300)) {
      val buf = new TopBuffer(k)
      buf.offer(Double.NaN, 7L)
      buf.offer(1.0, 1L)
      buf.offer(Double.NaN, 8L)
      val kept = drain(buf)
      assert(kept.size == 3, s"k=$k: under-filled offers dropped ($kept)")
      assert(kept.exists { case (d, id) => d.isNaN && id == 7L }, s"k=$k")
      assert(kept.exists { case (d, id) => d.isNaN && id == 8L }, s"k=$k")
      assert(kept.contains((1.0, 1L)), s"k=$k")
    }
  }

  test("Kryo round-trip (spark.serializer=KryoSerializer shuffles) restores both layouts") {
    // the dist-merge reduceByKey and the tree-merge task results cross the
    // spark.serializer boundary; under Kryo the @transient payload fields
    // only survive via the KryoSerializable implementation
    val ser = new org.apache.spark.serializer.KryoSerializer(
      new org.apache.spark.SparkConf()).newInstance()
    for (k <- Seq(5, 300)) {
      val buf = new TopBuffer(k)
      val xs = (0 until 3 * k).map(i => ((i * 31 % 100).toDouble, i.toLong))
      xs.foreach { case (d, id) => buf.offer(d, id) }
      val back = ser.deserialize[TopBuffer](ser.serialize(buf))
      assert(back.k == k, s"k=$k: capacity lost")
      assert(drain(back) == drain(buf), s"k=$k: contents changed")
      assert(back.bound == buf.bound, s"k=$k: bound changed")
      // the restored buffer keeps selecting correctly (absorb path)
      back.offer(-1.0, 999L)
      assert(drain(back).contains((-1.0, 999L)), s"k=$k: dead after revive")
      // and merges: absorb into a fresh buffer lands on the global top-k
      val merged = new TopBuffer(k).absorb(back)
      assert(drain(merged) == drain(back), s"k=$k: absorb mismatch")
    }
  }
}
