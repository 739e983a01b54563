package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** The REAL image path (javax.imageio) pinned end to end: synthetic
  * PNGs are genuine (an independent decode recovers the formula
  * dims), resize round-trips through decode→scale→re-encode, and
  * corrupt payloads quarantine as NULL dims instead of failing the
  * job or dropping rows.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val ids = Seq(0L, 1L, 7L, 59L, 61L, 1234L)

  test("syntheticImages emit genuine PNGs whose decoded dims match the id formulas") {
    val media = Multimodal.syntheticImages(ids.toDF("id"), "id")
    val rows = media.collect()
    assert(rows.length == ids.length)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      // PNG magic: a decoder could not fake this from text bytes
      assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      // independent decode (not the library's own reader path)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val id = r.getLong(0)
      assert(img.getWidth == Multimodal.synthWidth(id))
      assert(img.getHeight == Multimodal.synthHeight(id))
    }
  }

  test("decodeImageMeta recovers real dims; corrupt payloads yield NULL dims, not failures") {
    val media = Multimodal.syntheticImages(ids.toDF("id"), "id")
    val good = Multimodal.decodeImageMeta(media).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(good == ids.map(id =>
      id -> (Multimodal.synthWidth(id), Multimodal.synthHeight(id))).toMap)
    // corrupt: truncated PNG header + plain text bytes
    val corrupt = Seq(
      (100L, "image", Array[Byte](0x89.toByte, 'P', 'N')),
      (101L, "image", "not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    val bad = Multimodal.decodeImageMeta(corrupt).collect()
    assert(bad.length == 2, "quarantine keeps rows")
    assert(bad.forall(r => r.isNullAt(1) && r.isNullAt(2) && r.getLong(3) > 0))
  }

  test("imageChannelStats recovers the generative pixel formula exactly (PNG is lossless)") {
    val media = Multimodal.syntheticImages(ids.toDF("id"), "id")
    val got = Multimodal.imageChannelStats(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    ids.foreach { id =>
      val w = Multimodal.synthWidth(id); val h = Multimodal.synthHeight(id)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id % 1000003L + x * 31L + y * 17L) * 2654435761L) & 0xFFFFFF
        sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
      }
      assert(got(id) == ((w.toLong * h, sr, sg, sb)), s"id=$id")
    }
    // corrupt payloads: row kept, sums null
    import org.apache.spark.sql.functions.lit
    val corrupt = Seq((7L, "image", "junk".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    val bad = Multimodal.imageChannelStats(corrupt).collect().head
    assert(bad.getLong(0) == 7L && bad.isNullAt(1) && bad.isNullAt(2))
  }

  test("syntheticWavs are genuine RIFF/WAV; audioSampleStats recovers the sample formula exactly") {
    val media = Multimodal.syntheticWavs(ids.toDF("id"), "id")
    media.collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF" &&
        new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    }
    val got = Multimodal.audioSampleStats(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    ids.foreach { id =>
      val n = Multimodal.synthSampleCount(id)
      var sum = 0L; var sumAbs = 0L
      (0 until n).foreach { i =>
        val s = Multimodal.synthSample(id, i)
        sum += s; sumAbs += math.abs(s)
      }
      assert(got(id) == ((n.toLong, sum, sumAbs)), s"id=$id")
    }
    // corrupt payload: row kept, stats null, status = undecodable;
    // non-audio rows filtered
    val corrupt = Seq((5L, "audio", "not a wav".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    val bad = Multimodal.audioSampleStats(corrupt).collect().head
    assert(bad.getLong(0) == 5L && bad.isNullAt(1))
    assert(bad.getString(4) == "undecodable")
    val img = Seq((6L, "image", Array[Byte](1))).toDF("media_id", "media_type", "payload")
    assert(Multimodal.audioSampleStats(img).count() == 0)
    // a VALID but stereo WAV: distinguished from corruption
    val stereoPcm = new Array[Byte](16)
    val sfmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val sais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(stereoPcm), sfmt, 4L)
    val sbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(sais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, sbos)
    val stereo = Seq((8L, "audio", sbos.toByteArray))
      .toDF("media_id", "media_type", "payload")
    val srow = Multimodal.audioSampleStats(stereo).collect().head
    assert(srow.isNullAt(1) && srow.getString(4) == "unsupported_format")
  }

  test("syntheticGifs are genuine multi-frame containers; sampleFrames decodes the formula pixels") {
    val media = Multimodal.syntheticGifs(ids.toDF("id"), "id")
    media.collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(new String(bytes.take(3), "US-ASCII") == "GIF", "real GIF magic")
    }
    val frames = Multimodal.sampleFrames(media, n = 4).collect()
    // strided sampling contract: m = min(4, nf) frames at k*nf/m
    val expectIdx = ids.flatMap { id =>
      val nf = Multimodal.synthFrameCount(id)
      val m = math.min(4, nf)
      (0 until m).map(k => (id, k * nf / m, nf))
    }.toSet
    assert(frames.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet == expectIdx)
    // each sampled frame is a REAL decodable PNG of formula gray pixels
    frames.foreach { r =>
      val id = r.getLong(0); val f = r.getInt(1)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(img.getWidth == Multimodal.synthFrameWidth(id) &&
        img.getHeight == Multimodal.synthFrameHeight(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val g = Multimodal.synthGray(id, f, x, y)
        assert((img.getRGB(x, y) & 0xFFFFFF) == (g << 16 | g << 8 | g),
          s"id=$id frame=$f ($x,$y)")
      }
    }
    // undecodable containers emit zero frames; non-video rows filtered
    val corrupt = Seq((55L, "video", "not a gif".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    assert(Multimodal.sampleFrames(corrupt, 4).count() == 0)
    // TRUNCATED mid-container (valid magic + header, frame data cut):
    // frame reads past the cut throw inside the reader — the row must
    // quarantine to zero frames, never fail the job
    val full = media.where($"media_id" === 1234L)
      .collect().head.getAs[Array[Byte]]("payload")
    val truncated = Seq((56L, "video", full.take(full.length / 3)))
      .toDF("media_id", "media_type", "payload")
    assert(Multimodal.sampleFrames(truncated, 4).count() < 4)
    val img = Seq((6L, "image", Array[Byte](1))).toDF("media_id", "media_type", "payload")
    assert(Multimodal.sampleFrames(img, 4).count() == 0)
  }

  test("extractFeatures emits exact per-channel moments of genuinely decoded pixels") {
    val media = Multimodal.syntheticImages(ids.toDF("id"), "id")
    val got = Multimodal.extractFeatures(media, batchSize = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    ids.foreach { id =>
      val w = Multimodal.synthWidth(id); val h = Multimodal.synthHeight(id)
      var sr = 0L; var sg = 0L; var sb = 0L; var qr = 0L; var qg = 0L; var qb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id % 1000003L + x * 31L + y * 17L) * 2654435761L) & 0xFFFFFF
        val cr = (v >> 16) & 0xFF; val cg = (v >> 8) & 0xFF; val cb = v & 0xFF
        sr += cr; sg += cg; sb += cb; qr += cr * cr; qg += cg * cg; qb += cb * cb
      }
      val n = w.toDouble * h
      assert(got(id) == Seq(sr / n, sg / n, sb / n, qr / n, qg / n, qb / n), s"id=$id")
    }
    // corrupt payload: row kept, feature null (quarantine)
    val corrupt = Seq((9L, "image", "junk".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    val bad = Multimodal.extractFeatures(corrupt).collect().head
    assert(bad.getLong(0) == 9L && bad.isNullAt(1))
  }

  test("resizeImages truly rescales: re-decoded dims equal the target, corrupt rows drop") {
    val media = Multimodal.syntheticImages(ids.toDF("id"), "id")
      .union(Seq((999L, "image", "junk".getBytes("UTF-8")))
        .toDF("media_id", "media_type", "payload"))
    val resized = Multimodal.resizeImages(media, w = 5, h = 3)
    val redecoded = Multimodal.decodeImageMeta(resized).collect()
    assert(redecoded.map(_.getLong(0)).toSet == ids.toSet,
      "undecodable input has no image to scale and is dropped")
    assert(redecoded.forall(r => r.getInt(1) == 5 && r.getInt(2) == 3))
    // non-images pass through the media_type filter untouched
    val audio = Seq((7L, "audio", Array[Byte](1, 2))).toDF("media_id", "media_type", "payload")
    assert(Multimodal.resizeImages(audio, 5, 3).count() == 0)
  }
}
