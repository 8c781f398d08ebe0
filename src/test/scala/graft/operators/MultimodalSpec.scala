package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.col
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

  test("pngTable payloads are genuine PNGs that ImageIO decodes to the formula dims") {
    import spark.implicits._
    val rows = Multimodal
      .pngTable(spark, TestSpark.sfDir)
      .as[Multimodal.MediaRow]
      .limit(25)
      .collect()
    assert(rows.length === 25)
    val docs = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .select("doc_id", "text")
      .as[(Long, String)]
      .collect()
      .toMap
    rows.foreach { r =>
      val f = Multimodal.ImageIoDecoder.decode(r)
      val n = docs(r.doc_id).getBytes("UTF-8").length
      val (w, h) = Multimodal.pngDims(n)
      assert((f.width, f.height) === (w, h), s"doc ${r.doc_id}")
      // IHDR header parse (offsets 16..23, big-endian) agrees with the decode
      val p  = r.payload
      val hw = ((p(16) & 0xff) << 24) | ((p(17) & 0xff) << 16) | ((p(18) & 0xff) << 8) | (p(19) & 0xff)
      val hh = ((p(20) & 0xff) << 24) | ((p(21) & 0xff) << 16) | ((p(22) & 0xff) << 8) | (p(23) & 0xff)
      assert((hw, hh) === (w, h))
    }
  }

  test("jpegTable payloads are genuine JPEGs: ImageIO round-trips the dims, the SOF0 walk reads the same") {
    import spark.implicits._
    val rows = Multimodal
      .jpegTable(spark, TestSpark.sfDir)
      .as[Multimodal.MediaRow]
      .limit(25)
      .collect()
    assert(rows.length === 25)
    val docs = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .select("doc_id", "text")
      .as[(Long, String)]
      .collect()
      .toMap
    // the Spark-side structured segment walk on the same payloads
    val walked = rows.toSeq
      .map(r => (r.doc_id, r.payload))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.jpegSof0(col("payload")).as("sof"))
      .collect()
      .map(r => r.getLong(0) -> (r.getStruct(1).getLong(1), r.getStruct(1).getLong(0)))
      .toMap
    rows.foreach { r =>
      // a REAL decoder recovers the formula dims (pixels are NOT compared:
      // JPEG is lossy, which is exactly why the pixel-exactness decode
      // gate stays PNG-only and the JPEG family is header-path only)
      val img    = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      val n      = docs(r.doc_id).getBytes("UTF-8").length
      val (w, h) = Multimodal.pngDims(n)
      assert((img.getWidth, img.getHeight) === (w, h), s"doc ${r.doc_id}")
      // the codegen SOF0 walk agrees with the decoder
      assert(walked(r.doc_id) === ((w.toLong, h.toLong)), s"doc ${r.doc_id}")
      // SOI marker present
      assert((r.payload(0) & 0xff, r.payload(1) & 0xff) === ((0xff, 0xd8)))
    }
  }

  test("PNG synthesis is byte-deterministic (same doc -> same payload)") {
    import spark.implicits._
    val a = Multimodal.pngTable(spark, TestSpark.sfDir).as[Multimodal.MediaRow].limit(10).collect()
    val b = Multimodal.pngTable(spark, TestSpark.sfDir).as[Multimodal.MediaRow].limit(10).collect()
    assert(a.map(r => (r.doc_id, r.payload.toSeq)).toSeq === b.map(r => (r.doc_id, r.payload.toSeq)).toSeq)
  }

  test("ImageIoDecoder rejects non-image payloads instead of fabricating features") {
    val bad = Multimodal.MediaRow(7L, "image/png", "not a png".getBytes("UTF-8"))
    intercept[IllegalArgumentException](Multimodal.ImageIoDecoder.decode(bad))
  }

  test("wavTable payloads are genuine RIFF/WAVE files AudioSystem can parse") {
    import spark.implicits._
    val rows = Multimodal
      .wavTable(spark, TestSpark.sfDir)
      .as[Multimodal.MediaRow]
      .limit(25)
      .collect()
    val docs = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .select("doc_id", "text")
      .as[(Long, String)]
      .collect()
      .toMap
    rows.foreach { r =>
      val aff = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(r.payload))
      val n = docs(r.doc_id).getBytes("UTF-8").length
      val (rate, channels, nFrames) = Multimodal.wavParams(r.doc_id, n)
      assert(aff.getFormat.getSampleRate === rate.toFloat, s"doc ${r.doc_id}")
      assert(aff.getFormat.getChannels === channels)
      assert(aff.getFormat.getSampleSizeInBits === 16)
      assert(aff.getFrameLength === nFrames)
    }
  }

  test("q_multimodal_png_header census: every payload validates as 8-bit truecolor") {
    val out = graft.SparkEntry.queries("q_multimodal_png_header")(spark, TestSpark.sfDir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_images") > 0)
    assert(r.getAs[Long]("n_valid_rgb8") === r.getAs[Long]("n_images"))
  }

  test("q_multimodal_wav_meta header parse matches wavParams closed forms") {
    val out = graft.SparkEntry.queries("q_multimodal_wav_meta")(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    import spark.implicits._
    val docs = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .select("doc_id", "text")
      .as[(Long, String)]
      .collect()
      .toMap
    out.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val n     = docs(docId).getBytes("UTF-8").length
      val (rate, channels, nFrames) = Multimodal.wavParams(docId, n)
      assert(r.getAs[Boolean]("riff_ok"))
      assert(r.getAs[Long]("channels") === channels.toLong)
      assert(r.getAs[Long]("sample_rate") === rate.toLong)
      assert(r.getAs[Long]("bits") === 16L)
      assert(r.getAs[Long]("data_bytes") === nFrames.toLong * channels * 2)
      assert(r.getAs[Long]("n_frames") === nFrames.toLong)
    }
  }

  test("prodGt: the fingerprint bit rule survives products past Long range") {
    // the hash threshold compares sum*n against total*cnt; a ~6 MP image
    // (or ~9 min of audio) pushes those products past 2^63 — the naive Long
    // multiply wraps and silently flips bits. 2^40 * 2^40 = 2^80 wraps to
    // 0, so the naive compare answers false against 2^39 * 2^39 = 2^78:
    val big = 1L << 40
    assert(Multimodal.prodGt(big, big, big >> 1, big >> 1), "2^80 > 2^78 must hold past Long range")
    assert((big * big > (big >> 1) * (big >> 1)) === false, "the naive compare really does wrap")
    // equal 128-bit products are NOT greater (low-word unsigned compare)
    assert(!Multimodal.prodGt(big, big >> 2, big >> 1, big >> 1))
    // in-range values agree with plain Long arithmetic
    for ((a, b, c, d) <- Seq((3L, 7L, 4L, 5L), (10L, 10L, 100L, 1L), (0L, 5L, 1L, 1L)))
      assert(Multimodal.prodGt(a, b, c, d) === (a * b > c * d))
  }

  test("ahash: uniform image is all-zero bits; planted bright quadrant sets exactly its blocks") {
    import spark.implicits._
    def png(docId: Long)(pixel: (Int, Int) => Int): Multimodal.MediaRow = {
      val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, pixel(x, y))
      val bos = new java.io.ByteArrayOutputStream(256)
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.MediaRow(docId, "image/png", bos.toByteArray)
    }
    val uniform = png(1L)((_, _) => 0x808080)
    // bright top-left 8x8 quadrant = ahash blocks with bx < 4 and by < 4
    val quadrant = png(2L)((x, y) => if (x < 8 && y < 8) 0xffffff else 0x000000)
    val rows = Multimodal
      .ahashFrame(Seq(uniform, quadrant).toDF())
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(rows(1L) === "0" * 64, "no block of a uniform image exceeds the mean")
    val expected = (0 until 64)
      .map(b => if (b % 8 < 4 && b / 8 < 4) '1' else '0')
      .mkString
    assert(rows(2L) === expected, s"bright quadrant must set exactly its 16 blocks: ${rows(2L)}")
    // decode is pixel-exact: identical pixel content through separate
    // encodes hashes identically
    val again = Multimodal.ahashFrame(Seq(png(3L)((x, y) => if (x < 8 && y < 8) 0xffffff else 0x000000)).toDF())
      .collect()(0).getString(1)
    assert(again === expected)
  }

  test("audio fingerprint: silence is all-zero bits; a loud second half sets exactly its segments") {
    import spark.implicits._
    def wav(docId: Long, samples: Array[Short]): Multimodal.MediaRow = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, k) =>
        pcm(2 * k) = (s & 0xff).toByte
        pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream(64 + pcm.length)
      javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      Multimodal.MediaRow(docId, "audio/wav", bos.toByteArray)
    }
    val silence = wav(1L, Array.fill[Short](64)(0))
    val loudTail = wav(2L, Array.tabulate[Short](64)(k => if (k < 32) 0 else 1000))
    val rows = Multimodal
      .audioFingerprintFrame(Seq(silence, loudTail).toDF())
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(rows(1L) === ((64L, "00000000")), "silence has no segment above the (zero) mean")
    assert(rows(2L) === ((64L, "00001111")), s"loud second half must set exactly segments 4-7: ${rows(2L)}")
    // negative amplitudes count as energy: a loud NEGATIVE tail reads the same
    val negTail = Multimodal
      .audioFingerprintFrame(Seq(wav(3L, Array.tabulate[Short](64)(k => if (k < 32) 0 else -1000))).toDF())
      .collect()(0).getString(2)
    assert(negTail === "00001111")
  }

  test("ahash clusters conserve images and fingerprints against the hash frame") {
    val clusters = graft.SparkEntry
      .queries("q_multimodal_ahash_clusters")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ah = Multimodal.ahashFrame(Multimodal.pngTable(spark, TestSpark.sfDir)).collect()
    assert(clusters.map(_._3).sum === ah.length.toLong, "every image lands in exactly one cluster")
    assert(clusters.map(_._2).sum === ah.map(_.getString(1)).distinct.length.toLong,
      "every distinct fingerprint lands in exactly one cluster")
    clusters.foreach { case (label, nf, ni) =>
      assert(nf >= 1L && ni >= nf, s"cluster $label: images ($ni) can't be fewer than fingerprints ($nf)")
    }
  }

  test("ahash band pairs equal the exhaustive Hamming join on a synthetic fingerprint set") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def randHash() = (0 until 64).map(_ => if (rnd.nextBoolean()) '1' else '0').mkString
    def flip(h: String, positions: Int*) =
      positions.foldLeft(h)((s, p) => s.updated(p, if (s(p) == '1') '0' else '1'))
    val base = randHash()
    val hashes = Seq(
      (1L, base),
      (2L, flip(base, 0, 20, 40)), // Hamming 3, flips spread over 3 DIFFERENT bands
      (3L, flip(base, 5)),         // Hamming 1
      (4L, base),                  // exact dup: collapses into rep 1
      (5L, randHash())             // unrelated
    )
    val got = Multimodal
      .ahashBandPairs(hashes.toDF("doc_id", "ahash"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(6)))
      .toSet
    // driver-side exhaustive reference over distinct hashes
    val reps = hashes.map(_._2).distinct
    val expected = (for {
      a <- reps; b <- reps if a < b
      hd = a.zip(b).count { case (x, y) => x != y } if hd <= 3
    } yield (a, b, hd.toLong)).toSet
    assert(got === expected, s"banded must equal exhaustive: got ${got.size}, want ${expected.size}")
    assert(expected.exists(_._3 == 3L), "the planted cross-band Hamming-3 pair must be present")
  }
}
