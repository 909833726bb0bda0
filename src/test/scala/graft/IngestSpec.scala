package graft

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** File ingestion (SURVEY §2.1 S1-S4) + the saturating cast (F13) and
  * type-cast projection (P5). Round-trips written against hand-packed
  * little-endian fixtures, matching `VecSet::load_raw_file`
  * (`/root/reference/src/vec_set.rs:168-181`) and the fvecs layout
  * (`/root/reference/src/bin/convert_fvecs.rs:29-48`). */
class IngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir() =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "ingest_test")

  private def packF32(vecs: Seq[Array[Float]], path: String): Unit = {
    val out = new FileOutputStream(path)
    val bb = ByteBuffer.allocate(vecs.map(_.length).sum * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    vecs.foreach(_.foreach(bb.putFloat))
    out.write(bb.array()); out.close()
  }

  test("raw bin f32: read round-trips values, ids follow record order") {
    val dir = tmpDir()
    val vecs = (0 until 7).map(i => Array(i.toFloat, i + 0.5f, -i.toFloat))
    packF32(vecs, dir.resolve("a.bin").toString)
    val df = Ingest.readRawBin(spark, dir.resolve("a.bin").toString, dim = 3)
    val got = df.orderBy("id").as[(Long, Array[Float])].collect()
    assert(got.map(_._1).toSeq == (0L until 7L))
    got.zip(vecs).foreach { case ((_, g), w) => assert(g.sameElements(w)) }
  }

  test("raw bin: multi-file ids are stable in path order; limit keeps a prefix") {
    val dir = tmpDir()
    packF32((0 until 4).map(i => Array(i.toFloat, 0f)), dir.resolve("p1.bin").toString)
    packF32((4 until 6).map(i => Array(i.toFloat, 0f)), dir.resolve("p2.bin").toString)
    val all = Ingest.readRawBin(spark, dir.toString, dim = 2)
      .orderBy("id").as[(Long, Array[Float])].collect()
    assert(all.map(_._2(0).toLong).toSeq == (0L until 6L), "path-ordered ids")
    val limited = Ingest.readRawBin(spark, dir.toString, dim = 2, limit = Some(3))
    assert(limited.count() == 3)
    assert(limited.agg(max("id")).head().getLong(0) == 2L)
  }

  test("raw bin uint8: bytes promote to f32 like the reference's cast_to_f32") {
    val dir = tmpDir()
    val out = new FileOutputStream(dir.resolve("u8.bin").toString)
    out.write(Array[Byte](0, 1, 127, -128, -1, 50)) // unsigned: 0,1,127,128,255,50
    out.close()
    val got = Ingest.readRawBin(spark, dir.resolve("u8.bin").toString,
      dim = 3, dataType = "uint8").orderBy("id").as[(Long, Array[Float])].collect()
    assert(got(0)._2.toSeq == Seq(0f, 1f, 127f))
    assert(got(1)._2.toSeq == Seq(128f, 255f, 50f))
  }

  test("raw bin save: write then read round-trips (S2)") {
    val dir = tmpDir()
    val df = Seq((0L, Array(1.5f, -2f)), (1L, Array(0f, 3.25f))).toDF("id", "vec")
    val n = Ingest.writeRawBin(df, dir.resolve("out.bin").toString)
    assert(n == 2)
    val back = Ingest.readRawBin(spark, dir.resolve("out.bin").toString, dim = 2)
      .orderBy("id").as[(Long, Array[Float])].collect()
    assert(back(0)._2.toSeq == Seq(1.5f, -2f))
    assert(back(1)._2.toSeq == Seq(0f, 3.25f))
  }

  test("fvecs: read + convert to parquet (S4)") {
    val dir = tmpDir()
    val vecs = (0 until 5).map(i => Array(i * 1f, i * 2f, i * 3f, i * 4f))
    val out = new DataOutputStream(new FileOutputStream(dir.resolve("x.fvecs").toString))
    vecs.foreach { v =>
      val bb = ByteBuffer.allocate(4 + v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length); v.foreach(bb.putFloat)
      out.write(bb.array())
    }
    out.close()
    val got = Ingest.readFvecs(spark, dir.resolve("x.fvecs").toString)
      .orderBy("id").as[(Long, Array[Float])].collect()
    assert(got.length == 5)
    got.zip(vecs).foreach { case ((_, g), w) => assert(g.sameElements(w)) }
    val n = Ingest.convertFvecs(spark, dir.resolve("x.fvecs").toString,
      dir.resolve("pq_out").toString, limit = Some(4))
    assert(n == 4)
  }

  test("config-driven load honors dim/data_type/limit (S3)") {
    val dir = tmpDir()
    packF32((0 until 5).map(i => Array(i.toFloat, 1f)), dir.resolve("cfg.bin").toString)
    val cfgPath = dir.resolve("data.toml")
    Files.writeString(cfgPath,
      s"""# test config
         |dim = 2
         |data_type = "float32"
         |data_path = "${dir.resolve("cfg.bin")}"
         |limit = 3
         |""".stripMargin)
    val df = Ingest.loadWith(spark, cfgPath.toString)
    assert(df.count() == 3)
    assert(df.head().getAs[scala.collection.Seq[Float]]("vec").length == 2)
  }

  test("saturating u8 cast: NaN->0, truncate toward zero, saturate (F13)") {
    assert(Ingest.saturatingCastU8(Float.NaN) == 0)
    assert(Ingest.saturatingCastU8(Float.PositiveInfinity) == 255)
    assert(Ingest.saturatingCastU8(Float.NegativeInfinity) == 0)
    assert(Ingest.saturatingCastU8(3.9f) == 3)
    assert(Ingest.saturatingCastU8(-7.5f) == 0)
    assert(Ingest.saturatingCastU8(300f) == 255)
    val df = Seq((0L, Array(3.9f, -1f, 300f, Float.NaN))).toDF("id", "vec")
      .select(Ingest.vecCastU8(col("vec")).as("u8"))
    assert(df.head().getAs[scala.collection.Seq[Int]]("u8").toSeq == Seq(3, 0, 255, 0))
    // P5: cast projection back to float
    val f = Seq((0L, Array(1, 2, 255))).toDF("id", "v")
      .select(Ingest.vecCastFloat(col("v")).as("f"))
    assert(f.head().getAs[scala.collection.Seq[Float]]("f").toSeq == Seq(1f, 2f, 255f))
  }
}
