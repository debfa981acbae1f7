package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class MultimodalSpec extends SparkFunSuite {
  import spark.implicits._

  test("asMedia wraps text as binary payloads with modality metadata") {
    val docs = Seq((7L, "hello")).toDF("doc_id", "text")
    val m = Multimodal.asMedia(docs, "doc_id", "text").head
    assert(m.getAs[String]("modality") == "image")
    assert(new String(m.getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
  }

  test("extractFeatures runs the stub codec batched per partition, deterministically") {
    val docs = Seq((1L, "abc"), (2L, "a" * 100)).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 3L)
    assert(feats(1L).width == 3 % 64 + 1)
    assert(feats(1L).height == ('a'.toInt & 0xff) % 64 + 1)
    assert(feats(2L).n_bytes == 100L)
    assert(feats(2L).width == 100 % 64 + 1)
    // rerun gives identical checksums (determinism of the whole path)
    val again = Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().map(f => f.doc_id -> f.checksum).toMap
    assert(again == feats.map { case (k, v) => k -> v.checksum })
  }

  test("sampleFrames: n evenly spaced windows per doc, deterministic offsets") {
    val docs = Seq((1L, "0123456789" * 10)).toDF("doc_id", "text") // 100 bytes
    val frames = Multimodal.sampleFrames(Multimodal.asMedia(docs, "doc_id", "text"),
      n = 3, frameBytes = 10).collect().sortBy(_.frame_idx)
    assert(frames.length == 3)
    assert(frames.map(_.offset).toSeq == Seq(0L, 45L, 90L))
    assert(frames.forall(_.frame.length == 10))
    assert(new String(frames.head.frame, "UTF-8") == "0123456789")
  }

  test("sampleFrames on empty payload yields no frames") {
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    assert(Multimodal.sampleFrames(Multimodal.asMedia(docs, "doc_id", "text"), 3).count() == 0)
  }

  test("custom codec plugs into the same plumbing") {
    val fixed = new Multimodal.Codec {
      def decode(payload: Array[Byte], modality: String): (Int, Int) = (640, 480)
      def resize(payload: Array[Byte], modality: String,
                 w: Int, h: Int): Array[Byte] = payload
    }
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"), fixed).head()
    assert(f.width == 640 && f.height == 480)
  }

  test("resizeAll: fixed output size, deterministic nearest-neighbor stub") {
    val docs = Seq((1L, "abcdefgh"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.resizeAll(Multimodal.asMedia(docs, "doc_id", "text"), 2, 2)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).payload.length == 4 && out(1L).width == 2 && out(1L).height == 2)
    // evenly spaced byte picks from "abcdefgh" (len 8, n 4): offsets 0,2,4,6
    assert(new String(out(1L).payload) == "aceg")
    assert(out(2L).payload.isEmpty)
    // upsampling repeats source bytes, never goes out of bounds
    val up = Multimodal.resizeAll(Multimodal.asMedia(
      Seq((3L, "xy")).toDF("doc_id", "text"), "doc_id", "text"), 3, 2).head()
    assert(up.payload.length == 6 && up.payload.forall(b => b == 'x' || b == 'y'))
  }
}
