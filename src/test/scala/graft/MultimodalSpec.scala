package graft

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkFunSuite {
  import spark.implicits._

  test("asBinary + decodeMeta: deterministic byte-level metadata") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 10)
    val meta = Multimodal.decodeMeta(
      Multimodal.asBinary(docs, "doc_id", "text"), "doc_id").collect()
    val lens = docs.select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    meta.foreach { r =>
      val id = r.getLong(0)
      val byteLen = r.getInt(2)
      assert(byteLen == lens(id))            // ascii corpus: bytes == chars
      assert(r.getInt(3) == byteLen % 640 + 1)
      assert(r.getInt(4) == byteLen * 7 % 480 + 1)
      assert(Set("image", "audio", "video").contains(r.getString(1)))
    }
  }

  test("frameSample emits n frame fingerprints per record") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 5)
    val frames = Multimodal.frameSample(
      Multimodal.asBinary(docs, "doc_id", "text"), "doc_id", nFrames = 4).collect()
    frames.foreach(r => assert(r.getSeq[Long](2).length == 4))
  }

  test("resize stub: deterministic dims, capped size, stable fingerprint") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 5)
    val media = Multimodal.asBinary(docs, "doc_id", "text")
    val r1 = Multimodal.resizeMeta(media, "doc_id", 64, 48).collect()
    val r2 = Multimodal.resizeMeta(media, "doc_id", 64, 48).collect()
    assert(r1.map(_.toSeq).sameElements(r2.map(_.toSeq))) // deterministic
    r1.foreach { r =>
      assert(r.getInt(2) == 64 && r.getInt(3) == 48)
      assert(r.getInt(4) <= 64 * 48 * 3)
    }
    // different target dims -> different fingerprints
    val other = Multimodal.resizeMeta(media, "doc_id", 32, 32).collect()
    assert(r1.map(_.getLong(5)).toSet.intersect(other.map(_.getLong(5)).toSet).isEmpty)
  }

  test("typed decodeFeatures path computes partition-local features") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 5)
    val feats = Multimodal.decodeFeatures(spark,
      Multimodal.asBinary(docs, "doc_id", "text"), "doc_id").collect()
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    feats.foreach { f =>
      val bytes = texts(f.id).getBytes("UTF-8")
      val mean = bytes.map(_ & 0xFF).sum.toDouble / bytes.length
      assert(math.abs(f.meanByte - mean) < 1e-9)
      assert(f.byteLen == bytes.length)
    }
  }
}
