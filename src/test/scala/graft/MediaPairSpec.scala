package graft

import org.apache.spark.sql.functions._

import graft.media.Multimodal

/** C13g/C13h/C13i — the cross-modal pair family: key INDEPENDENCE is
  * the semantic content (same image + different caption and same
  * caption + different image are both NON-duplicates of the pair),
  * byteHashEmbed is the C61 rule verbatim on byte positions, and the
  * pair ANN ranks image-dup cohorts first.
  */
class MediaPairSpec extends SparkSpec {

  test("pair dedup is a conjunction: either modality differing keeps the pair") {
    val sess = spark
    import sess.implicits._
    // (pair_id, image key, caption): 1/2 full dup; 3 same image new
    // caption; 4 same caption new image; 5 unrelated
    val rows = Seq(
      (1L, 7L, "a cat"), (2L, 7L, "a cat"),
      (3L, 7L, "a CAT on a mat"),
      (4L, 9L, "a cat"),
      (5L, 11L, "a dog"))
    val pairs = rows.toDS().map { case (id, k, cap) =>
      graft.media.PairRow(id, Multimodal.pairImageBytes(k), cap)
    }
    val sig = pairs
      .map(p => (p.pair_id, Multimodal.dHashOf(p.payload), p.caption))
      .toDF("pair_id", "phash", "cdig")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("phash"), col("cdig"))
    val got = sig.select(col("pair_id"),
        min(col("pair_id")).over(w).as("canonical"),
        count(lit(1)).over(w).as("n"))
      .orderBy(col("pair_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 1L, 2L), (2L, 1L, 2L), // the only true pair-dup group
      (3L, 3L, 1L),               // image dup, caption differs → kept
      (4L, 4L, 1L),               // caption dup, image differs → kept
      (5L, 5L, 1L)))
  }

  test("byteHashEmbed replays C61's rule on byte positions") {
    val payload = Multimodal.pairImageBytes(13L)
    val got = Multimodal.byteHashEmbed(payload, 16)
    // independent replay of the documented rule
    val want = new Array[Long](16)
    payload.zipWithIndex.foreach { case (b, i) =>
      val a = b & 0xFF
      val hh = (a.toLong * (1L + (131L * (i + 1)) % 997L)) % 1048576L
      want((hh % 16).toInt) += (if ((hh / 16) % 2 == 0) 1L else -1L)
    }
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_ != 0L), "embedding must not be the zero vector")
    // determinism: same payload, same vector
    assert(Multimodal.byteHashEmbed(payload, 16).toSeq == got.toSeq)
  }

  test("pair ANN ranks the query's image-dup cohort at cos 1.0 first") {
    val got = SparkEntry.queries("media_ann")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 50, "10 queries x top-5")
    // every rank-1 neighbor of a query whose image key recurs in the
    // corpus is an exact image dup (cos 1.0), and within a query ranks
    // are dense 1..5 with non-increasing cos
    got.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to 5), s"query $q ranks not dense")
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sortBy(-_).toSeq,
        s"query $q cos not non-increasing")
    }
    // image-dup cohorts exist at sf0.001 (500 docs / 64 keys), so at
    // least one query must see a perfect match
    assert(got.exists(_._4 == 1.0), "no cos-1.0 neighbor found at all")
  }
}
