package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.media._

/** C13: multimodal binary-column plumbing. The codec is a deterministic
  * stub (no media libs in the container); what's verified is the real
  * Spark contract: binary + typed-struct schema round-trips through
  * parquet, mapPartitions pipelines are shuffle-free and deterministic,
  * and column pruning keeps payload reads out of metadata-only plans.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(spark, sf("sf0.001"))

  test("binary payload + typed metadata round-trip through parquet") {
    val dir = Files.createTempDirectory("graft-media").toString + "/t"
    media.write.parquet(dir)
    import spark.implicits._
    val back = spark.read.parquet(dir).as[MediaRow]
    assert(back.count() == media.count())
    val a = media.filter(col("media_id") === 7).head()
    val b = back.filter(col("media_id") === 7).head()
    assert(java.util.Arrays.equals(a.payload, b.payload) && a.meta == b.meta)
  }

  test("frame sampling emits durationMs/stepMs frames with metadata dims") {
    val frames = Multimodal.sampleFrames(media, 1000L)
    val perDoc = frames.groupBy("media_id").count()
      .join(media.select(col("media_id"), col("meta.durationMs").as("d")), "media_id")
    import spark.implicits._
    val bad = perDoc.where(col("count") =!= greatest(lit(1L), floor(col("d") / 1000L))).count()
    assert(bad == 0)
    val f = frames.filter(col("media_id") === 3 && col("frame_idx") === 0).as[Frame].head()
    assert(f.pixels.length == f.width * f.height)
  }

  test("decode → resize pipeline is deterministic and shape-correct") {
    val r1 = Multimodal.resizeFrames(Multimodal.sampleFrames(media, 1000L), 8, 8)
    val r2 = Multimodal.resizeFrames(Multimodal.sampleFrames(media, 1000L), 8, 8)
    import spark.implicits._
    val f1 = r1.filter(col("media_id") === 5 && col("frame_idx") === 0).as[Frame].head()
    val f2 = r2.filter(col("media_id") === 5 && col("frame_idx") === 0).as[Frame].head()
    assert(f1.width == 8 && f1.height == 8 && f1.pixels.length == 64)
    assert(java.util.Arrays.equals(f1.pixels, f2.pixels), "stub codec must be deterministic")
  }

  test("feature extraction yields unit vectors; usable by ANN ops") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(media, 32)
    val f = feats.filter(col("media_id") === 11).head()
    assert(f.dim == 32 && f.vector.length == 32)
    val norm = math.sqrt(f.vector.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // feature column slots straight into the Ann/Dedup cosine pipelines
    val asEmb = feats.select(col("media_id").as("vec_id"),
      col("vector").as("embedding"))
    assert(asEmb.schema("embedding").dataType.typeName == "array")
  }

  test("codec is a swappable seam: second impl runs the same pipeline unchanged") {
    // a "real codec stand-in": different bodies, same trait — if this
    // compiles and runs through the SAME Multimodal methods, swapping
    // libjpeg/ffmpeg in later needs zero Spark-side changes
    object FlatCodec extends Codec {
      override def decodeFrame(payload: Array[Byte], frameIdx: Int, w: Int, h: Int): Array[Byte] =
        Array.fill(w * h)((payload.length % 251).toByte) // flat field, payload-dependent
      override def resize(src: Frame, w2: Int, h2: Int): Frame =
        Frame(src.media_id, src.frame_idx, w2, h2,
          Array.fill(w2 * h2)(src.pixels.headOption.getOrElse(0: Byte)))
      override def features(payload: Array[Byte], dim: Int): Array[Float] = {
        val v = Array.fill(dim)(1.0f); v.map(_ / math.sqrt(dim).toFloat)
      }
    }
    import spark.implicits._
    val f = Multimodal.resizeFrames(
      Multimodal.sampleFrames(media, 1000L, FlatCodec), 4, 4, FlatCodec)
      .filter(col("media_id") === 5 && col("frame_idx") === 0).as[Frame].head()
    // output is the OTHER codec's: flat field, not the stub's mixed hash
    assert(f.pixels.length == 16 && f.pixels.distinct.length == 1)
    val stub = Multimodal.resizeFrames(
      Multimodal.sampleFrames(media, 1000L), 4, 4)
      .filter(col("media_id") === 5 && col("frame_idx") === 0).as[Frame].head()
    assert(!java.util.Arrays.equals(f.pixels, stub.pixels),
      "the two codecs must be observably different through the same pipeline")
    val feat = Multimodal.extractFeatures(media, 16, FlatCodec).filter(col("media_id") === 11).head()
    assert(feat.vector.forall(x => math.abs(x - 0.25f) < 1e-6))
  }

  test("pipelines stay shuffle-free (no Exchange in the plan)") {
    val plan = Multimodal.resizeFrames(
      Multimodal.sampleFrames(media, 1000L), 8, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
