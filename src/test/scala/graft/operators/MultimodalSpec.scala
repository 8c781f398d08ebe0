package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("binary media table has opaque payload + typed metadata") {
    val media = Multimodal.mediaTable(spark, TestSpark.sfDir)
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") === "binary")
    assert(schema("media_type") === "string")
    assert(media.count() > 0)
  }

  test("per-partition stub decode emits deterministic typed features") {
    val media = Multimodal.mediaTable(spark, TestSpark.sfDir).limit(50)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 50)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width >= 16 && f.width < 256)
      assert(f.height >= 16 && f.height < 256)
      assert(f.checksum.length === 32)
    }
    // determinism: same input -> same features
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).toSeq === again.map(_.checksum).toSeq)
  }

  test("frame sampling fans out map-side and respects the stride") {
    val media  = Multimodal.mediaTable(spark, TestSpark.sfDir).limit(10)
    val frames = Multimodal.sampleFrames(media, everyN = 2).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.doc_id).foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).forall(_ % 2 == 0), "stride must skip odd frames")
      assert(fs.map(_.frame_idx).distinct.length === fs.length)
    }
    assert(frames.forall(_.frame.length <= 64))
  }

  test("resize preserves aspect ratio direction and bounds dims") {
    val media   = Multimodal.mediaTable(spark, TestSpark.sfDir).limit(10)
    val resized = Multimodal.resize(Multimodal.sampleFrames(media), maxDim = 32).collect()
    resized.foreach { f =>
      assert(f.width <= 32 && f.height <= 32 && f.width >= 1 && f.height >= 1)
    }
  }

  test("stub embedder emits deterministic unit-range vectors of the asked dims") {
    val media = Multimodal.mediaTable(spark, TestSpark.sfDir).limit(20)
    val rows  = Multimodal.embedMedia(media, dims = 8).select("doc_id", "e").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length === 8)
      assert(v.forall(x => x >= 0.0 && x < 1.0))
    }
    val again = Multimodal.embedMedia(media, dims = 8).select("doc_id", "e").collect()
    assert(rows.map(_.getSeq[Double](1)).toSeq === again.map(_.getSeq[Double](1)).toSeq)
  }

  test("q_multimodal_embed ranks by cosine similarity, best-first") {
    val out = graft.SparkEntry.queries("q_multimodal_embed")(spark, TestSpark.sfDir).collect()
    assert(out.length === 5)
    val sims = out.map(_.getDouble(1))
    assert(sims.toSeq === sims.sorted.reverse.toSeq, "descending by cos_sim")
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("stub decoder is content-addressed (checksum = md5 of payload)") {
    val row = Multimodal.MediaRow(1L, "image/fake", "hello".getBytes("UTF-8"))
    val f   = Multimodal.StubDecoder.decode(row)
    assert(f.checksum === "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(f.n_bytes === 5L)
  }
}
