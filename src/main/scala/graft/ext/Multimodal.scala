package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north_star): image/audio/video carried
  * as opaque `binary` payloads with typed metadata, processed in
  * batches per partition.
  *
  * The real decode step (JPEG/WAV/H.264) needs native libraries this
  * container doesn't ship, so the decoders below are DETERMINISTIC
  * STUBS — clearly marked — that fabricate plausible features from the
  * payload bytes. Everything around them is real and tested: the
  * schema, the binary column handling, the per-partition batch shape
  * (`mapPartitions`, the Scala analogue of `mapInPandas` batches), and
  * the partitioning strategy (payloads hash-partitioned by id so a
  * decode fleet load-balances; at 100 TB you'd also cap
  * `files.maxPartitionBytes` so one partition's payloads fit in an
  * executor's working memory).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Fabricate a media table from any (id, text) source: payload =
    * UTF-8 bytes, media_type round-robins image/audio/video. Lets the
    * multimodal path run on the stock testdata without inventing new
    * input files.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("media_type"),
      col(textCol).cast("binary").as("payload"))

  /** STUB image decode ??? — stands in for a real JPEG decoder.
    * Deterministic fake: dimensions derived from payload length. The
    * Spark-side shape is the real one: a codegen'd projection over the
    * binary column, no data leaves the executor.
    */
  def decodeImageMeta(media: DataFrame): DataFrame =
    media.where(col("media_type") === "image")
      .select(
        col("media_id"),
        (octet_length(col("payload")) % 640 + 1).cast("int").as("width"),
        (octet_length(col("payload")) * 7 % 480 + 1).cast("int").as("height"),
        octet_length(col("payload")).cast("long").as("n_bytes"))

  /** STUB image resize ??? — stands in for a real scaler. The fake
    * keeps the first ceil(w·h/16) payload bytes (a deterministic
    * "thumbnail"); the Spark-side shape is the real one — a binary→
    * binary codegen'd projection with the new typed dimensions, no
    * data leaving the executor.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val budget = (w * h + 15) / 16
    media.where(col("media_type") === "image")
      .select(
        col("media_id"),
        lit(w).as("width"),
        lit(h).as("height"),
        expr(s"substring(payload, 1, $budget)").as("payload"))
  }

  /** STUB frame sampler ??? — stands in for video frame extraction.
    * Emits `n` byte-range "frames" per video payload via binary
    * substring: the real operator's exact plumbing (one row in, n
    * typed binary rows out) with a fake extractor.
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
