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
  * Video decode (H.264) still needs native codecs this container
  * doesn't ship, so [[sampleFrames]] and the generic
  * [[extractFeatures]] remain DETERMINISTIC STUBS — clearly marked —
  * with real Spark-side plumbing: schema, binary column handling,
  * per-partition batch shape (`mapPartitions`, the Scala analogue of
  * `mapInPandas` batches), and hash-partitioning by id so a decode
  * fleet load-balances (at 100 TB you'd also cap
  * `files.maxPartitionBytes` so one partition's payloads fit in an
  * executor's working memory).
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

  /** Fabricate a media table from any (id, text) source: payload =
    * UTF-8 bytes, media_type round-robins image/audio/video. Lets the
    * STUB audio/video paths run on the stock testdata; for the real
    * image path use [[syntheticImages]] (genuine PNG payloads).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("media_type"),
      col(textCol).cast("binary").as("payload"))

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
              img.setRGB(x, y, (((id + x * 31L + y * 17L) * 2654435761L) & 0xFFFFFF).toInt)
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
    ((((id + i * 7L) * 2654435761L) & 0xFFFF) - 32768L).toInt

  /** A REAL audio table: one genuine WAV payload per row (RIFF header
    * + 16-bit little-endian mono PCM at 8 kHz), written on the
    * executors with `javax.sound.sampled` — the pure-JVM audio codec
    * path, no native libs. Sample values and counts are [[synthSample]]
    * / [[synthSampleCount]] formulas of the id, the audio twin of
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
            val pcm = new Array[Byte](n * 2)
            var i = 0
            while (i < n) {
              val s = synthSample(id, i)
              pcm(2 * i) = (s & 0xFF).toByte
              pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new ByteArrayInputStream(pcm), fmt, n.toLong)
            val bos = new ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            Row(id, "audio", bos.toByteArray)
          }
        }(encoder)
    }
  }

  /** REAL audio decode: `javax.sound.sampled` parses the container
    * (format sniffed from the bytes) and streams PCM frames; one pass
    * sums the 16-bit samples as exact longs — n_samples, sum, and
    * sum of absolute values (the integer core of loudness/silence
    * gating). WAV PCM is lossless, so over [[syntheticWavs]] these
    * sums prove SAMPLE-level encode→decode fidelity. Undecodable
    * payloads quarantine as NULL stats with the row preserved.
    */
  def audioSampleStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("sum_s", LongType, nullable = true),
      StructField("sum_abs", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.where(col("media_type") === "audio")
      .select("media_id", "payload").mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
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
              Row(id, n, sum, sumAbs)
            } finally ais.close()
          } catch {
            case _: Exception => Row(id, null, null, null)
          }
        }
      }(encoder)
  }

  /** STUB frame sampler ??? — stands in for video frame extraction
    * (H.264 needs native codecs). Emits `n` byte-range "frames" per
    * video payload via binary substring: the real operator's exact
    * plumbing (one row in, n typed binary rows out) with a fake
    * extractor.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val frames = broadcast(media.sparkSession.range(n)
      .select(col("id").cast("int").as("frame_no")))
    media.where(col("media_type") === "video")
      .crossJoin(frames)
      .select(col("media_id"), col("frame_no"),
        expr("substring(payload, frame_no * 8 + 1, 8)").as("frame_bytes"))
      .where(octet_length(col("frame_bytes")) > 0)
  }

  /** STUB batch feature extractor ??? — stands in for a native/model
    * featurizer that wants whole batches (the `mapInPandas` shape).
    * Processes each partition as one batch through an iterator —
    * constant memory, no collect — and emits a fixed-width feature
    * vector fabricated from payload bytes.
    */
  def extractFeatures(media: DataFrame, dim: Int = 4, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      // explicit batches of `batchSize` rows — the shape a native/model
      // featurizer wants (one inference call per batch, the mapInPandas
      // arrow-batch analogue); grouped() keeps memory at one batch
      it.grouped(batchSize).flatMap { batch =>
        // ??? real batched featurizer goes here; fake: mean of byte
        // strides, one pass over the payload, no per-(row,dim)
        // collection allocation
        batch.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val sums = new Array[Double](dim)
          val counts = new Array[Int](dim)
          var i = 0
          while (i < bytes.length) {
            sums(i % dim) += (bytes(i) & 0xff)
            counts(i % dim) += 1
            i += 1
          }
          val feature = Array.tabulate(dim)(d =>
            if (counts(d) == 0) 0.0 else sums(d) / counts(d))
          Row(id, feature.toSeq)
        }
      }
    }(encoder)
  }
}
