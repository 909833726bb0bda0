package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-format ingestion — the reference's load/convert surface re-expressed
  * as Spark reads (SURVEY §2.1):
  *
  *  - S1 raw packed binary → (id, vec) rows (`VecSet::load_raw_file`,
  *    `/root/reference/src/vec_set.rs:168-181`); float32 and uint8 element
  *    types (`/root/reference/src/scalar.rs:79-95`), uint8 promoted to f32
  *    on load the way every reference distance op promotes it
  *    (`cast_to_f32`, `scalar.rs:36-40`);
  *  - S2 raw binary save (`VecSet::save_raw_file`, `vec_set.rs:184-192`) —
  *    a driver-streamed export of one packed file (the format is inherently
  *    single-file; the scale sink is Parquet, which every operator here
  *    already reads/writes);
  *  - S3 config-driven load (`DynamicVecSet::load_with`,
  *    `/root/reference/src/vec_set.rs:242-252`, config shape
  *    `/root/reference/src/config.rs:30-52`);
  *  - S4 fvecs → columnar conversion (`convert_fvecs`,
  *    `/root/reference/src/bin/convert_fvecs.rs:29-48`): fvecs records are
  *    `u32 dim (LE)` + `dim × f32 (LE)`.
  *
  * Distributed shape: `binaryFile` lists the input once for (path, length)
  * metadata — record counts give each file its global id offset — then the
  * decode runs as one task per file. Ids are stable: files ordered by path,
  * records by position. A multi-TB corpus arrives as many files (one task
  * each); the one-file case degenerates to a single decode task, exactly the
  * reference's own sequential-read behavior, and should be converted to
  * Parquet once ([[convertFvecs]] / [[convertRawBin]]) rather than re-read.
  */
object Ingest {

  /** `VecDataConfig` (`/root/reference/src/config.rs:30-52`). */
  final case class VecDataConfig(
      dim: Int,
      dataType: String,
      dataPath: String,
      limit: Option[Long])

  /** Minimal parser for the reference's flat TOML config files
    * (`dim = 960`, `data_type = "float32"`, `data_path = "..."`,
    * `limit = 100000`). Quoted strings are unquoted; `#` comments and
    * unknown keys are ignored. */
  def parseConfig(text: String): VecDataConfig = {
    val kv = text.linesIterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(_.contains("="))
      .map { line =>
        val Array(k, v) = line.split("=", 2)
        k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
    VecDataConfig(
      dim = kv.getOrElse("dim",
        throw new IllegalArgumentException("config missing 'dim'")).toInt,
      dataType = kv.getOrElse("data_type", "float32"),
      dataPath = kv.getOrElse("data_path",
        throw new IllegalArgumentException("config missing 'data_path'")),
      limit = kv.get("limit").map(_.toLong))
  }

  /** S3 — load per a config file on the local filesystem. */
  def loadWith(spark: SparkSession, configPath: String): DataFrame = {
    val cfg = parseConfig(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(configPath)),
      java.nio.charset.StandardCharsets.UTF_8))
    readRawBin(spark, cfg.dataPath, cfg.dim, cfg.dataType, cfg.limit)
  }

  private def bytesPer(dataType: String): Int = dataType match {
    case "float32" => 4
    case "uint8"   => 1
    case other => throw new IllegalArgumentException(
      s"unsupported data_type '$other' (float32 | uint8)")
  }

  /** (path → global record offset) for stable ids across files. */
  private def fileOffsets(
      spark: SparkSession, path: String, recordBytes: Int): Map[String, Long] = {
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "length").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    files.foreach { case (p, len) =>
      require(len % recordBytes == 0,
        s"$p: size $len is not a multiple of the $recordBytes-byte record") }
    val offsets = files.scanLeft(0L)(_ + _._2 / recordBytes)
    files.map(_._1).zip(offsets).toMap
  }

  /** S1 — read packed little-endian vectors as (id, vec) rows. */
  def readRawBin(
      spark: SparkSession,
      path: String,
      dim: Int,
      dataType: String = "float32",
      limit: Option[Long] = None): DataFrame = {
    import spark.implicits._
    require(dim > 0, "dim must be positive")
    val bp = bytesPer(dataType)
    val offsets = fileOffsets(spark, path, dim * bp)
    val bc = spark.sparkContext.broadcast(offsets)
    val isU8 = dataType == "uint8"
    val out = spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, content) =>
        val base = bc.value(p)
        val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
        val n = content.length / (dim * bp)
        Iterator.range(0, n).map { i =>
          val vec = new Array[Float](dim)
          var j = 0
          while (j < dim) {
            vec(j) =
              if (isU8) (content(i * dim + j) & 0xff).toFloat
              else buf.getFloat((i * dim + j) * 4)
            j += 1
          }
          (base + i, vec)
        }
      }
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    limit.map(l => out.filter(col("id") < l)).getOrElse(out)
  }

  /** S2 — export (id, vec) rows as one packed little-endian file, rows in
    * ascending id order. Driver-streamed (constant memory). */
  def writeRawBin(
      df: DataFrame,
      outPath: String,
      dataType: String = "float32",
      idCol: String = "id",
      vecCol: String = "vec"): Long = {
    val bp = bytesPer(dataType)
    val sorted = df.select(col(idCol), col(vecCol).cast("array<float>"))
      .orderBy(col(idCol))
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(outPath)))
    var n = 0L
    try {
      sorted.toLocalIterator().forEachRemaining { row =>
        val vec = row.getSeq[Float](1)
        val bb = ByteBuffer.allocate(vec.length * bp).order(ByteOrder.LITTLE_ENDIAN)
        vec.foreach { v =>
          if (dataType == "uint8") bb.put(saturatingCastU8(v).toByte)
          else bb.putFloat(v)
        }
        out.write(bb.array())
        n += 1
      }
    } finally out.close()
    n
  }

  /** S4 — read fvecs records (`u32 dim` + `dim × f32`, both LE). The dim is
    * taken from each record header (the reference asserts homogeneity by
    * construction; we validate). */
  def readFvecs(
      spark: SparkSession,
      path: String,
      limit: Option[Long] = None): DataFrame = {
    import spark.implicits._
    // per-file record counts need the header dim; fvecs files are
    // homogeneous, so read 4 bytes worth of metadata via the first file
    val meta = spark.read.format("binaryFile").load(path)
      .select("path", "length").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(meta.nonEmpty, s"no files at $path")
    val headDim = {
      val in = new java.io.DataInputStream(
        java.nio.file.Files.newInputStream(java.nio.file.Paths.get(
          new java.net.URI(meta.head._1).getPath)))
      try java.lang.Integer.reverseBytes(in.readInt())
      finally in.close()
    }
    require(headDim > 0, s"bad fvecs header dim $headDim")
    val recordBytes = 4L + 4L * headDim
    meta.foreach { case (p, len) =>
      require(len % recordBytes == 0,
        s"$p: size $len is not a multiple of the $recordBytes-byte record") }
    val offsets = meta.map(_._1).zip(
      meta.scanLeft(0L)(_ + _._2 / recordBytes)).toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val out = spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, content) =>
        val base = bc.value(p)
        val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
        val n = content.length / recordBytes.toInt
        Iterator.range(0, n).map { i =>
          val off = i * recordBytes.toInt
          val dim = buf.getInt(off)
          require(dim == headDim, s"$p record $i: dim $dim != $headDim")
          val vec = new Array[Float](dim)
          var j = 0
          while (j < dim) { vec(j) = buf.getFloat(off + 4 + 4 * j); j += 1 }
          (base + i, vec)
        }
      }
      .toDF("id", "vec")
    limit.map(l => out.filter(col("id") < l)).getOrElse(out)
  }

  /** S4 — fvecs → Parquet conversion job (the Spark shape of the
    * `convert_fvecs` CLI). Returns the row count written. */
  def convertFvecs(
      spark: SparkSession, inPath: String, outDir: String,
      limit: Option[Long] = None): Long = {
    val df = readFvecs(spark, inPath, limit)
    df.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  /** Raw bin → Parquet conversion job (same role as [[convertFvecs]] for
    * the reference's own storage format). */
  def convertRawBin(
      spark: SparkSession, inPath: String, outDir: String, dim: Int,
      dataType: String = "float32", limit: Option[Long] = None): Long = {
    val df = readRawBin(spark, inPath, dim, dataType, limit)
    df.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  // ------------------------------------------------------------- F13 / P5

  /** F13 scalar — Rust `f32 as u8` (`/root/reference/src/scalar.rs:22-46`):
    * truncate toward zero, NaN → 0, saturate to [0, 255]. */
  def saturatingCastU8(v: Float): Int =
    if (v.isNaN) 0
    else if (v >= 255f) 255
    else if (v <= 0f) 0
    else v.toInt

  /** F13 columnar — elementwise saturating f32 → u8 over a vector column.
    * NaN → 0 first, clamp to [0, 255], then the int cast truncates toward
    * zero (clamping first keeps it ANSI-safe). Returns `array<int>` holding
    * u8-range values. */
  def vecCastU8(vec: Column): Column =
    transform(vec, x => {
      val clean = when(isnan(x), lit(0f)).otherwise(x)
      least(lit(255f), greatest(lit(0f), clean)).cast("int")
    })

  /** P5 — type-cast projection back to the engine's float vector shape
    * (`VecSet<T> → VecSet<U>` through f32, `/root/reference/src/vec_set.rs:139-149`). */
  def vecCastFloat(vec: Column): Column =
    transform(vec, _.cast("float"))
}
