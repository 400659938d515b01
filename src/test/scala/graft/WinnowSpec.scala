package graft

/** C69 `text_winnow_fingerprints` — an independent driver-side replay
  * of the winnowing rule (k=3, w=4, rightmost-min ties) on a planted
  * periodic doc that forces hash ties inside windows, plus the
  * published coverage guarantee (Schleimer et al. 2003): docs sharing
  * a run of >= k+w-1 words share a fingerprint, and every w-window of
  * gram positions contains a selected position.
  */
class WinnowSpec extends SparkSpec {

  private val K = 3; private val W = 4; private val Pow = 1048576L

  private def corpus(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = "target/tmp/winnow"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def h8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** The reference implementation, independent of the query's encode
    * trick: scan each window left->right keeping min with <= (so the
    * RIGHTMOST minimal position wins), dedup the selections.
    */
  private def winnow(text: String): Set[(Long, Long)] = {
    val ws = text.split(" ")
    val hs = (0 to ws.length - K).map(i => h8(ws.slice(i, i + K).mkString(" ")))
    (0 to hs.length - W).map { j =>
      var best = (hs(j), j)
      for (p <- j + 1 until j + W) if (hs(p) <= best._1) best = (hs(p), p)
      (best._2.toLong, best._1)
    }.toSet
  }

  test("C69 replay: periodic doc (forced in-window hash ties) matches exactly") {
    // period-3 doc -> only 3 distinct grams; the minimal one repeats at
    // p and p+3 INSIDE one window, so the rightmost-min rule decides
    // real selections here, not just hypothetically.
    val doc = Seq.fill(4)("aqq bqq cqq").mkString(" ") // 12 words, 10 grams
    val out = SparkEntry.queries("text_winnow_fingerprints")(spark, corpus(Seq(doc)))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == winnow(doc))
  }

  test("C69 guarantee: a shared 6-word run yields a shared fingerprint") {
    val run = "r00 r01 r02 r03 r04 r05"
    val a = s"x00 x01 x02 x03 $run x04 x05 x06"
    val b = s"y00 y01 $run y02 y03 y04 y05 y06 y07"
    val rows = SparkEntry.queries("text_winnow_fingerprints")(spark, corpus(Seq(a, b)))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val fa = rows.filter(_._1 == 0L).map(_._2).toSet
    val fb = rows.filter(_._1 == 1L).map(_._2).toSet
    assert((fa & fb).nonEmpty, s"no shared fingerprint: $fa vs $fb")
  }

  test("C69 coverage: every w-window of gram positions holds a selection") {
    val rows = SparkEntry.queries("text_winnow_fingerprints")(spark, sf())
      .collect().groupBy(_.getLong(0))
    val lens = SparkEntry.queries("text_tokens")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach { case (doc, rs) =>
      val ps = rs.map(_.getLong(1)).toSet
      val m = (lens(doc) - (K - 1)).toInt // gram count
      (0 to m - W).foreach { j =>
        assert((j until j + W).exists(p => ps.contains(p.toLong)),
          s"doc $doc window $j holds no fingerprint")
      }
    }
  }
}
