package graft

import graft.ext.{Dedup, Multimodal}
import org.apache.spark.sql.functions._

/** Perceptual image hashing: the aHash signature's perceptual
  * property (a resized image hashes near its original, unrelated
  * images don't), and the uneven-segment pigeonhole multi-index's
  * exactness against brute force on real image signatures.
  */
class PhashSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("a resized image hashes near its original; unrelated images don't") {
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 200)
    val imgs = Multimodal.syntheticImages(docs, "doc_id")
    val orig = Multimodal.imageAHash(imgs)
      .select(col("media_id"), col("phash").as("p_orig"))
    // a real Graphics2D rescale to 32x32 — different pixel raster,
    // same coarse light/dark structure
    val resized = Multimodal.imageAHash(
      Multimodal.resizeImages(imgs, 32, 32)
        .select("media_id", "media_type", "payload"))
      .select(col("media_id"), col("phash").as("p_res"))
    val matched = orig.join(resized, "media_id")
      .select(bit_count(col("p_orig").bitwiseXOR(col("p_res"))).as("d"))
      .agg(avg(col("d"))).head.getDouble(0)
    // unrelated baseline: hashes of DIFFERENT images (shifted pairing)
    val shifted = resized.withColumn("media_id",
      (col("media_id") + 1) % 200)
    val unrelated = orig.join(shifted, "media_id")
      .select(bit_count(col("p_orig").bitwiseXOR(col("p_res"))).as("d"))
      .agg(avg(col("d"))).head.getDouble(0)
    info(s"avg hamming: matched=$matched unrelated=$unrelated")
    assert(matched < unrelated - 8,
      s"resize should preserve the hash far better than chance " +
        s"(matched=$matched, unrelated=$unrelated)")
    assert(unrelated > 20, s"unrelated pairs should be near-random ($unrelated)")
  }

  test("uneven-segment multi-index finds exactly the brute-force pairs at dist<=12") {
    val docs = Tables.documents(spark, sf)
    val imgs = Multimodal.syntheticImages(docs, "doc_id")
    val sigs = Multimodal.imageAHash(imgs)
      .select(col("media_id").as("doc_id"), col("phash").as("simhash"))
      .cache()
    val indexed = Dedup.signatureNearPairs(sigs, bits = 64, maxDist = 12)
      .select("doc_a", "doc_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = sigs.select(col("doc_id").as("doc_a"), col("simhash").as("sa"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("simhash").as("sb"))
    val brute = a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("dist"))
      .where(col("dist") <= 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty, "fixture should contain some near pairs at dist<=12")
    assert(indexed == brute,
      s"pigeonhole must be exact: ${brute.size} brute pairs vs ${indexed.size} indexed")
  }
}
