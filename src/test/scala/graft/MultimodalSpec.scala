package graft

import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, per-partition extraction,
  * deterministic stub features, digest/length verified against local
  * recomputation. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "Ünïcodé bytes")).toDF("doc_id", "text")

  test("payload column is the utf-8 bytes of the text") {
    val rows = Multimodal.withPayload(docs)
      .select("doc_id", "payload").as[(Long, Array[Byte])].collect().toMap
    assert(rows(1L).sameElements("hello world".getBytes("UTF-8")))
    assert(rows(3L).sameElements("Ünïcodé bytes".getBytes("UTF-8")))
  }

  test("extractFeatures: digest and length match local recomputation") {
    val feats = Multimodal.extractFeatures(Multimodal.withPayload(docs))
      .collect().map(f => f.doc_id -> f).toMap
    for ((id, text) <- Seq(1L -> "hello world", 3L -> "Ünïcodé bytes")) {
      val bytes = text.getBytes("UTF-8")
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = md.digest(bytes).map("%02x".format(_)).mkString
      assert(feats(id).byte_len == bytes.length)
      assert(feats(id).digest == want)
      assert(feats(id).feat.sameElements(Multimodal.fakeDecode(bytes)))
    }
  }

  test("empty payload yields zero features, not a crash") {
    val f = Multimodal.extractFeatures(Multimodal.withPayload(docs))
      .collect().find(_.doc_id == 2L).get
    assert(f.byte_len == 0)
    assert(f.feat.forall(_ == 0f))
  }

  test("features are deterministic across runs and partitionings") {
    val a = Multimodal.extractFeatures(Multimodal.withPayload(docs).repartition(3))
      .collect().map(f => f.doc_id -> f.feat.toSeq).toMap
    val b = Multimodal.extractFeatures(Multimodal.withPayload(docs).repartition(1))
      .collect().map(f => f.doc_id -> f.feat.toSeq).toMap
    assert(a == b)
  }
}
