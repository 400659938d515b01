package graft

import org.apache.spark.sql.functions._
import graft.media.{Codec, MediaMeta, MediaRow, Multimodal}

/** C13f `media_phash_neardup` — a planted codec with EXACT control of
  * the dHash bits: payload(0) = k decodes to a pixel row whose first k
  * gradient comparisons fire, so phash has exactly bits 0..k-1 set and
  * hamming(tag a, tag b) = |a − b|. Pins catch-at-1/2/3, reject-at-4,
  * and the pigeonhole completeness the banding is built on.
  */
class MediaHammingSpec extends SparkSpec {

  /** decodeFrame ignores everything but payload(0) = k: 9x8 canvas of
    * 50s with pixels 0..k-1 strictly descending from 60+k, so
    * p(j) > p(j+1) exactly for j < k.
    */
  private object TagCodec extends Codec {
    override def decodeFrame(payload: Array[Byte], frameIdx: Int, w: Int, h: Int): Array[Byte] = {
      val k = payload(0).toInt
      val px = Array.fill[Byte](w * h)(50)
      (0 until k).foreach(j => px(j) = (60 + k - j).toByte)
      px
    }
    // unused by dHash — the spec exercises the hash path only
    override def features(payload: Array[Byte], dim: Int): Array[Float] =
      Array.fill(dim)(0f)
    override def resize(src: graft.media.Frame, w2: Int, h2: Int): graft.media.Frame =
      src.copy(width = w2, height = h2, pixels = new Array[Byte](w2 * h2))
  }

  private def media(tags: Seq[Int]) = {
    import spark.implicits._
    tags.zipWithIndex.map { case (k, i) =>
      MediaRow(i.toLong, Array(k.toByte), MediaMeta("image", 9, 8, 0L, "tag"))
    }.toDS()
  }

  test("C13f emits exactly the hamming<=3 pairs; distance-4 verified away") {
    // ids 0/1/2/3 carry tags 0/1/3/4 -> pairwise hamming = tag diff
    val h = Multimodal.dHash(media(Seq(0, 1, 3, 4)), TagCodec).toDF()
    val out = graft.queries.Media.phashNearDupPairs(h)
      .orderBy(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 1L, 1L), (0L, 2L, 3L),          // (0,3): hamming 4 rejected
      (1L, 2L, 2L), (1L, 3L, 3L), (2L, 3L, 1L)))
  }

  test("C13f pigeonhole: bits spread one-per-band still share no band at 4 diffs") {
    // tags 0 and 4 differ in bits 0-3 — all inside band 0, so they DO
    // share bands 1-3 and become a candidate; verification must reject.
    // The planted pair proves rejection happens at VERIFY, not by luck
    // of candidacy.
    val h = Multimodal.dHash(media(Seq(0, 4)), TagCodec).toDF()
    val cands = h.as("a").join(h.as("b"), expr("a.media_id < b.media_id"))
      .select(expr("bit_count(a.phash ^ b.phash)").as("d")).collect()
    assert(cands.head.getInt(0) == 4)
    assert(graft.queries.Media.phashNearDupPairs(h).collect().isEmpty)
  }

  test("C13f driver gate shape: zero violations on the real corpus") {
    val v = SparkEntry.queries("inv_phash_neardup_sound")(spark, sf())
    assert(v.collect().isEmpty)
  }
}
