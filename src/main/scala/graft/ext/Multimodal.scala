package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north_star): image/audio/video carried
  * as opaque `binary` payloads with typed metadata, processed in
  * batches per partition.
  *
  * The IMAGE and AUDIO families are REAL: image payloads are genuine
  * encoded images run through `javax.imageio` (pure-JVM, headless
  * PNG/JPEG/GIF/BMP codec — [[decodeImageMeta]], [[resizeImages]],
  * [[imageChannelStats]]); audio payloads are genuine RIFF/WAV PCM
  * run through `javax.sound.sampled` ([[syntheticWavs]],
  * [[audioSampleStats]]) — no native deps, all on the executors.
  * The VIDEO family is REAL too, via the one multi-frame container
  * the pure-JVM codec stack can both write and read: animated GIF
  * ([[syntheticGifs]] encodes formula-pixel frames,
  * [[sampleFrames]] parses the container, strided-samples frames,
  * and re-encodes each as PNG). H.264 would need native codecs this
  * container doesn't ship — the GIF path exercises the identical
  * operator shape (container parse → frame index → per-frame
  * decode → 1-row-in/n-rows-out) with a codec that actually runs.
  * [[extractFeatures]] is likewise real: the feature vector is
  * per-channel moments of DECODED pixels. All paths share the batch
  * discipline: `mapPartitions` (the Scala analogue of `mapInPandas`
  * batches), payload bytes never leave the executors, and
  * hash-partitioning by id so a decode fleet load-balances (at
  * 100 TB you'd also cap `files.maxPartitionBytes` so one
  * partition's payloads fit in an executor's working memory).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** width/height are nullable: an undecodable payload yields NULL
    * dims rather than an exception or a dropped row, so a curation
    * pipeline can quarantine corrupt blobs with a plain filter — the
    * same stance as the corrupt-record handling on the text sources.
    */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /** Deterministic dimensions for [[syntheticImages]]: small enough
    * that a whole table encodes in seconds, varied enough that a
    * decoder returning a constant would be caught. An arithmetic
    * (id-only) formula so a SQL oracle can state the expected dims
    * without being able to decode.
    */
  def synthWidth(id: Long): Int = (id % 61 + 4).toInt
  def synthHeight(id: Long): Int = (id * 7 % 43 + 4).toInt

  /** A REAL image table built from any id source: one genuine PNG
    * payload per row, encoded on the executors with `javax.imageio`,
    * dimensions [[synthWidth]]×[[synthHeight]] and pixels both
    * deterministic in the id. The fixture for the real decode path —
    * a decoder that doesn't actually parse PNG cannot recover the
    * dims from these bytes.
    */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    // PlanCache: the fixture stands in for a STORED image corpus (the
    // real pipeline reads blobs, it doesn't re-render them per query),
    // so consumers decode cached bytes instead of re-encoding the
    // corpus on every run. The decoders under test still run live.
    PlanCache.cached(s"syntheticImages/$idCol", df) { d =>
      // hash-repartition by id BEFORE the per-row codec work: the doc
      // table often arrives as one parquet file = ONE partition, which
      // would serialize every downstream decode pass onto a single
      // core (measured 4× on the resize path) — the same reason a real
      // blob corpus is stored pre-partitioned
      d.select(col(idCol).cast("long").as("media_id"))
        .repartition(col("media_id")).mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = synthWidth(id)
          val h = synthHeight(id)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, (((id % 1000003L + x * 31L + y * 17L) * 2654435761L) & 0xFFFFFF).toInt)
              x += 1
            }
            y += 1
          }
          Row(id, "image", encodePng(img))
        }
      }(encoder)
    }
  }

  /** REAL image metadata decode: `javax.imageio` header read (format
    * sniffed from the bytes, dimensions parsed without decoding the
    * pixel raster — constant work per blob regardless of image size).
    * Batch shape: one `mapPartitions` pass, payload bytes never leave
    * the executor; undecodable payloads surface as NULL dims (see
    * [[imageMetaSchema]]).
    */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(imageMetaSchema)
    media.where(col("media_type") === "image")
      .select("media_id", "payload").mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          readDims(bytes) match {
            case Some((w, h)) => Row(id, w, h, bytes.length.toLong)
            case None         => Row(id, null, null, bytes.length.toLong)
          }
        }
      }(encoder)
  }

  /** REAL image resize: decode → `Graphics2D` scale to exactly w×h →
    * PNG re-encode, per partition on the executors. Output rows keep
    * the media contract (`media_id, media_type, payload` + the typed
    * new dims), so the result feeds [[decodeImageMeta]] or another
    * resize — undecodable payloads are dropped (they carry no image
    * to scale; run [[decodeImageMeta]] first to census them).
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, s"resize target ${w}x$h must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.where(col("media_type") === "image")
      .select("media_id", "payload").mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val src =
            try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          src.map { img =>
            val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
            Row(id, "image", w, h, encodePng(dst))
          }
        }
      }(encoder)
  }

  /** REAL per-image channel statistics: full `javax.imageio` decode,
    * one pass over the pixel raster summing R/G/B as exact longs —
    * the integer-exact core of an image featurizer (channel means =
    * sums / n_pixels, left to the caller so the output stays
    * oracle-portable). PNG is lossless, so a decoded pixel must equal
    * the encoded one bit-for-bit: over [[syntheticImages]] these sums
    * prove PIXEL-level encode→decode fidelity, not just header
    * parsing. Undecodable payloads quarantine as NULL sums with the
    * row preserved (same stance as [[decodeImageMeta]]).
    */
  def imageChannelStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.where(col("media_type") === "image")
      .select("media_id", "payload").mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          img match {
            case None => Row(id, null, null, null, null)
            case Some(im) =>
              var sr = 0L; var sg = 0L; var sb = 0L
              val w = im.getWidth; val h = im.getHeight
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = im.getRGB(x, y)
                  sr += (rgb >> 16) & 0xFF
                  sg += (rgb >> 8) & 0xFF
                  sb += rgb & 0xFF
                  x += 1
                }
                y += 1
              }
              Row(id, (w.toLong * h), sr, sg, sb)
          }
        }
      }(encoder)
  }

  /** 64-bit perceptual average-hash (aHash) per image: REAL decode,
    * gray = r+g+b per pixel, 8×8 block partition with floor buckets
    * (block i = x·8/w, j = y·8/h — blocks are empty when a dimension
    * is under 8, which hashes as a 0 bit), and bit j·8+i set iff the
    * block's mean gray exceeds the image mean — compared
    * INTEGER-EXACTLY as sum_block·n_total > total·n_block, so the
    * hash is bit-identical across engines with no float division.
    * Near-identical images (resizes, re-encodes, small retouches)
    * land within a few bits; pair them with
    * [[Dedup.signatureNearPairs]] — the image twin of text SimHash
    * dedup, one 8-byte signature per image, candidates bucketed by
    * the same pigeonhole multi-index. Undecodable payloads quarantine
    * as NULL hashes (same stance as [[decodeImageMeta]]).
    */
  def imageAHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.where(col("media_type") === "image")
      .select("media_id", "payload").mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          img match {
            case None => Row(id, null)
            case Some(im) =>
              val w = im.getWidth; val h = im.getHeight
              val sums = new Array[Long](64)
              val cnts = new Array[Long](64)
              var tot = 0L
              var y = 0
              while (y < h) {
                val j = y * 8 / h
                var x = 0
                while (x < w) {
                  val i = x * 8 / w
                  val rgb = im.getRGB(x, y)
                  val gray = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                  val b = j * 8 + i
                  sums(b) += gray; cnts(b) += 1; tot += gray
                  x += 1
                }
                y += 1
              }
              val nTot = w.toLong * h
              var phash = 0L
              var b = 0
              while (b < 64) {
                // strict >: an exactly-average block (incl. empty
                // blocks, 0 > 0) hashes as 0 on both engines
                if (sums(b) * nTot > tot * cnts(b)) phash |= (1L << b)
                b += 1
              }
              Row(id, phash)
          }
        }
      }(encoder)
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Header-only (width, height) via the ImageIO reader registry;
    * None when no installed reader recognizes the bytes or the header
    * is corrupt.
    */
  private def readDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          Some((reader.getWidth(0), reader.getHeight(0)))
        } catch {
          case _: Exception => None
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Deterministic sample count / value formulas for
    * [[syntheticWavs]] — arithmetic in the id (and sample index) so a
    * SQL oracle can state expected decoded statistics without an
    * audio decoder. 16-bit signed PCM range by construction.
    */
  def synthSampleCount(id: Long): Int = (id % 1500 + 300).toInt
  def synthSample(id: Long, i: Long): Int =
    ((((id % 1000003L + i * 7L) * 2654435761L) & 0xFFFF) - 32768L).toInt

  /** A REAL audio table: one genuine WAV payload per row — the
    * canonical 44-byte RIFF/WAVE PCM header (fmt + data chunks, the
    * same layout the JDK's WAVE writer emits) followed by 16-bit
    * little-endian mono PCM at 8 kHz, assembled directly on the
    * executors. The header is written by hand rather than through
    * `AudioSystem.write` because the JDK routes every write through a
    * globally-synchronized audio-provider lookup — at the @32 scale
    * point all 32 tasks convoy on that one lock (observed: a single
    * straggler task holding the stage for >10 min). The bytes remain
    * a genuine WAV container: [[audioSampleStats]] re-parses them
    * with a real RIFF reader, so the round trip still proves the
    * container format. Sample values and counts are [[synthSample]] /
    * [[synthSampleCount]] formulas of the id, the audio twin of
    * [[syntheticImages]].
    */
  def syntheticWavs(df: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    PlanCache.cached(s"syntheticWavs/$idCol", df) { d =>
      d.select(col(idCol).cast("long").as("media_id"))
        .repartition(col("media_id")).mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val n = synthSampleCount(id)
            val dataLen = n * 2
            val out = new Array[Byte](44 + dataLen)
            val bb = java.nio.ByteBuffer.wrap(out)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
              .put("WAVE".getBytes("US-ASCII"))
            bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
              .putShort(1)            // PCM
              .putShort(1)            // mono
              .putInt(8000)           // sample rate
              .putInt(8000 * 2)       // byte rate
              .putShort(2)            // block align
              .putShort(16)           // bits per sample
            bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
            var i = 0
            while (i < n) {
              bb.putShort(synthSample(id, i).toShort)
              i += 1
            }
            Row(id, "audio", out)
          }
        }(encoder)
    }
  }

  /** Audio parser providers, discovered ONCE per JVM. Going through
    * `AudioSystem.getAudioInputStream` re-runs provider discovery
    * behind a JVM-global lock on every call; over a 100k-row decode
    * stage that lock convoys every task in the executor (the @32
    * straggler above). Snapshotting the `AudioFileReader` SPI here
    * keeps the per-row decode lock-free while still using the real
    * JDK RIFF parser.
    */
  private lazy val audioReaders: Array[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader],
        classOf[javax.sound.sampled.spi.AudioFileReader].getClassLoader)
      .iterator()
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) buf += it.next()
    buf.toArray
  }

  /** Parse audio bytes with the cached provider snapshot — same
    * contract as `AudioSystem.getAudioInputStream` (first provider
    * that recognizes the container wins; none → None) without the
    * global provider-registry lock.
    */
  private def openAudio(bytes: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] = {
    var k = 0
    while (k < audioReaders.length) {
      try {
        return Some(audioReaders(k).getAudioInputStream(new ByteArrayInputStream(bytes)))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
      k += 1
    }
    None
  }

  /** REAL audio decode: the JDK's `AudioFileReader` SPI parses the
    * container (format sniffed from the bytes, providers cached
    * per-JVM by [[openAudio]]) and streams PCM frames; one pass
    * sums the 16-bit samples as exact longs — n_samples, sum, and
    * sum of absolute values (the integer core of loudness/silence
    * gating). WAV PCM is lossless, so over [[syntheticWavs]] these
    * sums prove SAMPLE-level encode→decode fidelity.
    *
    * The stats contract covers 16-bit signed mono PCM; everything
    * else quarantines as NULL stats with the row preserved and a
    * `status` column separating the two quarantine causes —
    * `unsupported_format` (a VALID container the summing pass doesn't
    * cover: stereo, 8/24-bit, float PCM) vs `undecodable` (no parser
    * recognizes the bytes) — so a census can tell corpus corruption
    * from coverage gaps.
    */
  def audioSampleStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("sum_s", LongType, nullable = true),
      StructField("sum_abs", LongType, nullable = true),
      StructField("status", StringType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.where(col("media_type") === "audio")
      .select("media_id", "payload").mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val ais = openAudio(bytes).getOrElse(
              throw new javax.sound.sampled.UnsupportedAudioFileException())
            try {
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                  fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                Row(id, null, null, null, "unsupported_format")
              else {
                val data = ais.readAllBytes()
                var n = 0L; var sum = 0L; var sumAbs = 0L
                var i = 0
                while (i + 1 < data.length) {
                  val lo = data(i) & 0xFF
                  val hi = data(i + 1).toInt
                  val s = if (fmt.isBigEndian) ((data(i).toInt << 8) | (data(i + 1) & 0xFF))
                          else ((hi << 8) | lo)
                  n += 1; sum += s; sumAbs += math.abs(s)
                  i += 2
                }
                Row(id, n, sum, sumAbs, "ok")
              }
            } finally ais.close()
          } catch {
            case _: Exception => Row(id, null, null, null, "undecodable")
          }
        }
      }(encoder)
  }

  /** 64-bit audio fingerprint per clip: REAL container decode (same
    * SPI snapshot as [[audioSampleStats]]), the PCM stream split into
    * 64 equal floor-bucket frames, per-frame energy = Σ|sample|, and
    * bit f set iff frame f's mean energy exceeds frame f−1's —
    * compared INTEGER-EXACTLY as E_f·c_{f−1} > E_{f−1}·c_f (bit 0 has
    * no predecessor and is always 0). The energy-envelope delta
    * profile is robust to gain-independent re-encodes and is the
    * shape (not the DSP depth) of production audio fingerprints;
    * near-dup clips pair through [[Dedup.signatureNearPairs]] exactly
    * like text SimHash and image aHash — one 8-byte signature per
    * clip, the third modality through the same pair engine.
    * Non-16-bit-mono-PCM or undecodable payloads quarantine as NULL.
    */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("afp", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.where(col("media_type") === "audio")
      .select("media_id", "payload").mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val ais = openAudio(bytes).getOrElse(
              throw new javax.sound.sampled.UnsupportedAudioFileException())
            try {
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                  fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                Row(id, null)
              else {
                val data = ais.readAllBytes()
                val n = data.length / 2
                val e = new Array[Long](64)
                val c = new Array[Long](64)
                var i = 0
                while (i + 1 < data.length) {
                  val lo = data(i) & 0xFF
                  val hi = data(i + 1).toInt
                  val s = if (fmt.isBigEndian) ((data(i).toInt << 8) | (data(i + 1) & 0xFF))
                          else ((hi << 8) | lo)
                  val f = ((i / 2).toLong * 64 / n).toInt
                  e(f) += math.abs(s); c(f) += 1
                  i += 2
                }
                var fp = 0L
                var f = 1
                while (f < 64) {
                  if (c(f) > 0 && c(f - 1) > 0 &&
                      e(f) * c(f - 1) > e(f - 1) * c(f)) fp |= (1L << f)
                  f += 1
                }
                Row(id, fp)
              }
            } finally ais.close()
          } catch {
            case _: Exception => Row(id, null)
          }
        }
      }(encoder)
  }

  /** Deterministic shape formulas for [[syntheticGifs]] — arithmetic
    * in the id (and frame/pixel indices) so a SQL oracle can state
    * expected decoded frame pixels without a video decoder. Frames
    * are 8-bit GRAY (GIF is palette-indexed; an explicit 256-gray
    * palette makes the encode lossless, so decoded pixels must equal
    * the formula bit-for-bit).
    */
  def synthFrameCount(id: Long): Int = (id % 5 + 2).toInt
  def synthFrameWidth(id: Long): Int = (id % 13 + 4).toInt
  def synthFrameHeight(id: Long): Int = (id * 3 % 11 + 4).toInt
  def synthGray(id: Long, f: Long, x: Long, y: Long): Int =
    (((id % 1000003L + f * 101L + x * 31L + y * 17L) * 2654435761L) & 0xFF).toInt

  /** Identity 256-entry gray palette: GIF stores palette indices, so
    * with index == gray value the encode is exact, not quantized.
    */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** A REAL multi-frame video table: one genuine animated-GIF
    * container per row ([[synthFrameCount]] full-size frames of
    * [[synthFrameWidth]]×[[synthFrameHeight]] gray pixels from the
    * [[synthGray]] formula), encoded on the executors with the JDK's
    * GIF `ImageWriter` sequence API — the video twin of
    * [[syntheticImages]]/[[syntheticWavs]]. A frame sampler that
    * doesn't truly parse the container cannot recover per-frame
    * pixels from these bytes.
    */
  def syntheticGifs(df: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    PlanCache.cached(s"syntheticGifs/$idCol", df) { d =>
      // repartition before codec work: one-file parquet = ONE
      // partition otherwise (same rationale as syntheticImages)
      d.select(col(idCol).cast("long").as("media_id"))
        .repartition(col("media_id")).mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val nf = synthFrameCount(id)
            val w = synthFrameWidth(id)
            val h = synthFrameHeight(id)
            val bos = new ByteArrayOutputStream()
            val ios = ImageIO.createImageOutputStream(bos)
            val writer = ImageIO.getImageWritersByFormatName("gif").next()
            // interlace (GIF "progressive") OFF: the JDK pair
            // mis-round-trips interlaced row order at small heights —
            // sequential scan order is bit-exact
            val param = writer.getDefaultWriteParam
            param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
            try {
              writer.setOutput(ios)
              writer.prepareWriteSequence(null)
              var f = 0
              while (f < nf) {
                val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
                val raster = img.getRaster
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    raster.setSample(x, y, 0, synthGray(id, f, x, y))
                    x += 1
                  }
                  y += 1
                }
                writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
                f += 1
              }
              writer.endWriteSequence()
            } finally {
              writer.dispose()
              ios.close()
            }
            Row(id, "video", bos.toByteArray)
          }
        }(encoder)
    }
  }

  /** REAL video frame extraction: parse the multi-frame container
    * (`ImageIO` reader registry — GIF here; the operator shape is
    * codec-agnostic), count frames, STRIDED-sample
    * `m = min(n, frames)` of them at indices `k * frames / m`
    * (what a real video sampler does — spread over the clip, not
    * just the head), decode each sampled frame, and re-encode it as
    * PNG under the media contract — so sampled frames feed straight
    * into [[decodeImageMeta]] / [[imageChannelStats]] /
    * [[resizeImages]]. One row in, ≤n typed rows out, all inside one
    * `mapPartitions` pass; payload bytes never leave the executor.
    * Undecodable containers yield zero frames (they carry no frame
    * to extract — census corrupt blobs upstream, as with
    * [[resizeImages]]).
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"frame sample size $n must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.where(col("media_type") === "video")
      .select("media_id", "payload").mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
            try {
              val readers = ImageIO.getImageReaders(iis)
              if (!readers.hasNext) Vector.empty
              else {
                val reader = readers.next()
                try {
                  reader.setInput(iis)
                  val nf = reader.getNumImages(true)
                  val m = math.min(n, nf)
                  // materialized before reader.dispose(): the rows own
                  // re-encoded bytes, not reader state; ≤ n small
                  // frames per input row, so memory stays bounded
                  (0 until m).map { k =>
                    val idx = k * nf / m
                    val raw = reader.read(idx)
                    // normalize indexed/gray frames to RGB before the
                    // PNG re-encode: an indexed-gray source would be
                    // written as a GRAYSCALE png, and the CS_GRAY ↔
                    // sRGB conversion on re-decode SHIFTS pixel values
                    // (gamma) — palette→RGB lookup here is exact
                    val rgb = new BufferedImage(raw.getWidth, raw.getHeight,
                      BufferedImage.TYPE_INT_RGB)
                    val g = rgb.createGraphics()
                    try g.drawImage(raw, 0, 0, null) finally g.dispose()
                    Row(id, idx, nf, "image", encodePng(rgb))
                  }.toVector
                } finally reader.dispose()
              }
            } finally iis.close()
          } catch {
            case _: Exception => Vector.empty
          }
        }
      }(encoder)
  }

  /** REAL batch feature extractor: decodes each image and emits a
    * 6-dim feature vector of per-channel pixel moments —
    * `[mean_r, mean_g, mean_b, m2_r, m2_g, m2_b]` (mean and mean of
    * squares per channel; variance = m2 − mean², left to the caller
    * so each component stays a single exact division). Batch shape
    * is the `mapInPandas` analogue a native/model featurizer wants:
    * explicit `grouped(batchSize)` batches through one partition
    * iterator — constant memory, no collect. Undecodable payloads
    * quarantine as a NULL feature with the row preserved (same
    * stance as [[decodeImageMeta]]).
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.where(col("media_type") === "image")
      .select("media_id", "payload").mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "inference call" per batch: decode all, then emit —
          // the arrow-batch shape, with memory capped at one batch
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val img =
              try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
              catch { case _: Exception => None }
            img match {
              case None => Row(id, null)
              case Some(im) =>
                var sr = 0L; var sg = 0L; var sb = 0L
                var qr = 0L; var qg = 0L; var qb = 0L
                val w = im.getWidth; val h = im.getHeight
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = im.getRGB(x, y)
                    val cr = (rgb >> 16) & 0xFF
                    val cg = (rgb >> 8) & 0xFF
                    val cb = rgb & 0xFF
                    sr += cr; sg += cg; sb += cb
                    qr += cr.toLong * cr; qg += cg.toLong * cg; qb += cb.toLong * cb
                    x += 1
                  }
                  y += 1
                }
                val n = w.toDouble * h
                Row(id, Seq(sr / n, sg / n, sb / n, qr / n, qg / n, qb / n))
            }
          }
        }
      }(encoder)
  }
}
