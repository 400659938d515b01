package graft

import graft.media.{Codec, Frame, MediaMeta, MediaRow, Multimodal}

/** C13d — perceptual-hash dedup through the Codec seam.
  *
  * The stub-codec side (identical payloads collide, distinct payloads
  * separate) rides the driver gate; what ONLY a spec can prove is the
  * NEAR-dup path with a controlled codec: a grid codec whose decode is
  * the payload itself lets the test place individual dHash bits, so the
  * banded candidate join's pigeonhole guarantee (Hamming ≤ 3 with 4
  * bands ⇒ some band untouched ⇒ pair found) is witnessed bit-for-bit —
  * the exact division of labor media_features uses for its vectors.
  */
class MediaPhashSpec extends SparkSpec {

  /** Decode = payload bytes verbatim (padded), resize = identity when
    * shapes match — the test authors the 9×8 luma grid directly.
    */
  private object GridCodec extends Codec {
    override def decodeFrame(payload: Array[Byte], frameIdx: Int, w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, w * h)
    override def resize(src: Frame, w2: Int, h2: Int): Frame =
      if (src.width == w2 && src.height == h2) src
      else throw new IllegalStateException("GridCodec authors 9×8 grids directly")
    override def features(payload: Array[Byte], dim: Int): Array[Float] =
      Array.fill(dim)(0f)
  }

  private def media(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.map { case (id, p) => MediaRow(id, p, MediaMeta("image", 9, 8, 1000L, "grid")) }
      .toDS()
  }

  /** A base 9×8 grid with a known, non-degenerate comparison pattern. */
  private def baseGrid: Array[Byte] =
    Array.tabulate(72)(i => ((i * 37 + 11) % 251).toByte)

  /** Flip dHash bit (y*8+x) by moving the LEFT pixel of its comparison
    * to the other side of the right pixel. Changing pixel (y,x) also
    * feeds comparison bit y·8+x−1 (it is that bit's RIGHT operand), so
    * multi-flip tests only use ROW-START bits (x = 0), which have no
    * left neighbor — each such flip provably touches exactly one bit.
    */
  private def flipBit(g: Array[Byte], bit: Int): Array[Byte] = {
    val (y, x) = (bit / 8, bit % 8)
    require(x == 0, s"only row-start bits are isolated (got bit $bit)")
    val out = g.clone()
    val l = g(y * 9) & 0xFF
    val r = g(y * 9 + 1) & 0xFF
    // make the comparison answer the opposite of what it was
    out(y * 9) = (if (l > r) math.max(0, r - 1) else math.min(255, r + 1)).toByte
    out
  }

  test("identical payloads collide; distinct payloads separate (stub codec)") {
    val p1 = "same payload".getBytes("UTF-8")
    val p2 = "other payload".getBytes("UTF-8")
    val rows = Seq(1L -> p1, 2L -> p1.clone(), 3L -> p2).map { case (id, p) =>
      MediaRow(id, p, MediaMeta("image", 16, 16, 1000L, "stub"))
    }
    import spark.implicits._
    val groups = Multimodal.phashDupGroups(rows.toDS()).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(groups.toSeq == Seq((1L, 2L)))
  }

  test("near-dup at Hamming 1: banded join finds the pair, verifies the distance") {
    val a = baseGrid
    val b = flipBit(a, 0)
    val pairs = Multimodal.phashNearDupPairs(media(10L -> a, 20L -> b), 3, GridCodec)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((10L, 20L)))
  }

  test("pigeonhole: 3 flipped bits across 3 different bands still collide via the 4th") {
    val a = baseGrid
    // bits 0, 16, 32 live in bands 0, 1, 2 — band 3 (bits 48..63) untouched
    val b = flipBit(flipBit(flipBit(a, 0), 16), 32)
    val pairs = Multimodal.phashNearDupPairs(media(1L -> a, 2L -> b), 3, GridCodec)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("Hamming 4 is over threshold: pair rejected even when a band matches") {
    val a = baseGrid
    // 4 flips all inside bands 0-2 — band 3 still matches, so the pair IS
    // a candidate; the bit_count verification must reject it
    val b = flipBit(flipBit(flipBit(flipBit(a, 0), 8), 16), 32)
    val pairs = Multimodal.phashNearDupPairs(media(1L -> a, 2L -> b), 3, GridCodec)
      .collect()
    assert(pairs.isEmpty)
  }

  test("dHash bit placement: flipping bit k changes exactly bit k") {
    val a = baseGrid
    for (k <- Seq(0, 8, 16, 32, 56)) {
      val hashes = Multimodal.dHash(media(1L -> a, 2L -> flipBit(a, k)), GridCodec)
        .collect().sortBy(_.media_id).map(_.phash)
      assert(java.lang.Long.bitCount(hashes(0) ^ hashes(1)) == 1, s"bit $k")
      assert(((hashes(0) ^ hashes(1)) >>> k) == 1L, s"bit $k position")
    }
  }

  test("C13e incremental: corpus collisions drop, batch-internal dups collapse") {
    val corpusPayload = "already indexed".getBytes("UTF-8")
    val dupPayload = "batch dup".getBytes("UTF-8")
    val freshPayload = "fresh item".getBytes("UTF-8")
    def rows(xs: (Long, Array[Byte])*) = {
      import spark.implicits._
      xs.map { case (id, p) => MediaRow(id, p, MediaMeta("image", 16, 16, 1000L, "stub")) }
        .toDS()
    }
    val corpus = rows(1L -> corpusPayload)
    val delta = rows(
      10L -> corpusPayload.clone(), // collides with the corpus → dropped
      11L -> dupPayload, 12L -> dupPayload.clone(), // internal dup → one row
      13L -> freshPayload)
    val got = Multimodal.phashIncremental(corpus, delta)
      .orderBy("media_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((11L, 2L), (13L, 1L)))
  }

  test("gate query agrees with an independent text-grouping at sf0.001") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("media_phash_dedup")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("text"))
    val want = graft.core.Tables(spark, sf(), "documents")
      .select(col("doc_id").as("media_id"),
        min(col("doc_id")).over(w).as("canonical_id"),
        count(lit(1)).over(w).as("n"))
      .orderBy(col("media_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }
}
