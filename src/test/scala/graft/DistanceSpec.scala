package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Hand-computed distance constants — FIXTURES.md §2, replicating
  * `/root/reference/src/distance/mod.rs:131-151`. */
class DistanceSpec extends SparkTestBase {
  import spark.implicits._

  private def one(a: Seq[Float], b: Seq[Float], kind: String): Double = {
    val df = Seq((a, b)).toDF("a", "b")
    val c = kind match {
      case "dot" => vecDot(col("a"), col("b"))
      case "l2"  => vecL2Sq(col("a"), col("b"))
      case "cos" => vecCosine(col("a"), col("b"))
    }
    df.select(c.as("d")).head().getDouble(0)
  }

  test("dot([1,2,3],[4,5,6]) = 32") {
    assert(math.abs(one(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), "dot") - 32.0) < 1e-6)
  }
  test("l2sqr([1,2,3],[4,5,6]) = 27") {
    assert(math.abs(one(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), "l2") - 27.0) < 1e-6)
  }
  test("cosine([1,2,3],[2,4,6]) = 0 (parallel vectors)") {
    assert(math.abs(one(Seq(1f, 2f, 3f), Seq(2f, 4f, 6f), "cos")) < 1e-6)
  }
  test("cosine zero-vector clamp (1e-10) gives distance 1, not NaN") {
    val d = one(Seq(0f, 0f), Seq(1f, 1f), "cos")
    assert(!d.isNaN && math.abs(d - 1.0) < 1e-6)
  }
  test("distance symmetry and self-distance zero") {
    val a = Seq(0.5f, -1.25f, 3f, 0f)
    val b = Seq(2f, 0.25f, -1f, 4f)
    assert(one(a, b, "l2") == one(b, a, "l2"))
    assert(one(a, a, "l2") == 0.0)
    assert(math.abs(one(a, a, "cos")) < 1e-7)
  }
  test("dimension mismatch raises") {
    intercept[Exception] { one(Seq(1f, 2f), Seq(1f, 2f, 3f), "l2") }
  }

  test("binary (f32 LE) operands: pack round-trips, distances bit-identical to the array path") {
    // the r20 rerank-base layout: VecDistance scores fixed-width binary
    // vectors directly; same float→double widening, same accumulation
    // order ⇒ the doubles must be IDENTICAL, not merely close
    val rnd = new scala.util.Random(41)
    val rows = (0 until 50).map { i =>
      (i.toLong, Seq.fill(97)(rnd.nextFloat() * 4f - 2f))
    }
    val df = rows.toDF("id", "vec")
      .withColumn("vecb", vecToBinary(col("vec"))).cache()
    // round-trip
    val rt = df.select(col("id"), binaryToVec(col("vecb")).as("back"),
        col("vec"))
      .filter(col("back") =!= col("vec")).count()
    assert(rt == 0L, "pack/unpack round-trip must be exact")
    val q = rows.head._2
    for (kind <- Seq("l2sqr", "cosine")) {
      val viaArr = df.select(col("id"),
          distance(col("vec"), typedLit(q), kind).as("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val viaBin = df.select(col("id"),
          distance(col("vecb"), typedLit(q), kind).as("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      // binary on BOTH sides too
      val viaBoth = df.select(col("id"),
          distance(col("vecb"), vecToBinary(typedLit(q)), kind).as("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      rows.foreach { case (id, _) =>
        assert(viaArr(id) == viaBin(id), s"$kind id=$id bin vs array")
        assert(viaArr(id) == viaBoth(id), s"$kind id=$id bin-bin vs array")
      }
    }
    // mismatched / malformed binary raises with the expression's message
    val e = intercept[Exception] {
      df.select(distance(expr("binary('abc')"), typedLit(q), "l2sqr"))
        .collect()
    }
    assert(e.getMessage.contains("multiple of 4") ||
      Option(e.getCause).exists(_.getMessage.contains("multiple of 4")))
    df.unpersist()
  }

  test("F6: registered SQL functions evaluate from spark.sql") {
    // the calc_dist SQL surface: register() must produce resolvable
    // functions (Spark 4 validates the registration source tag — a bad
    // tag only throws at RESOLUTION time, which column-API tests never hit)
    graft.functions.VectorFunctions.register(spark)
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("distance_spec_pairs")
    val r = spark.sql(
      """SELECT vec_dot(a, b) AS d, vec_l2sq(a, b) AS l, vec_cosine(a, b) AS c
        |FROM distance_spec_pairs""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-6)
    assert(math.abs(r.getDouble(1) - 27.0) < 1e-6)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 0.03)
  }
}
