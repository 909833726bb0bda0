package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One extracted media-feature row. `feat` is the (stubbed) model output. */
case class MediaFeature(
    doc_id: Long,
    byte_len: Int,
    digest: String,
    feat: Array[Float])

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * columns with typed metadata, processed by per-partition batch workers —
  * the Spark shape of a decode/feature-extract stage. The decoder itself is
  * STUBBED with a deterministic fake (this container has no image/audio
  * libraries): `fakeDecode` computes byte-level moments standing in for
  * model features. Everything around it — binary schema, typed Dataset,
  * partition-wise batch init (one "model load" per partition, like a real
  * ONNX/JNI session), output schema — is real and tested.
  */
object Multimodal {

  /** Attach a binary payload column (stand-in for real media bytes — here
    * the utf-8 encoding of `text`, which keeps the oracle able to verify
    * length/digest end-to-end). */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** STUB decode: a deterministic fake "model" — byte mean, variance, min,
    * max scaled to [0,1]. A real deployment swaps this one function for the
    * actual decoder; the Spark plumbing around it is unchanged. */
  private[graft] def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    if (bytes.isEmpty) return Array(0f, 0f, 0f, 0f)
    var sum = 0.0; var min = 255; var max = 0
    bytes.foreach { b =>
      val u = b & 0xff
      sum += u; if (u < min) min = u; if (u > max) max = u
    }
    val mean = sum / bytes.length
    var varAcc = 0.0
    bytes.foreach { b => val d = (b & 0xff) - mean; varAcc += d * d }
    Array((mean / 255.0).toFloat, math.sqrt(varAcc / bytes.length).toFloat / 255f,
      min / 255f, max / 255f)
  }

  /** Feature extraction over the binary column: typed `mapPartitions` so
    * per-partition setup (digest instance here; a model session in real
    * life) happens once per task, not once per row. */
  def extractFeatures(
      withBinary: DataFrame,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[MediaFeature] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        it.map { case (id, bytes) =>
          md.reset()
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          MediaFeature(id, bytes.length, digest, fakeDecode(bytes))
        }
      }
  }
}
