package graft

/** C65 `text_url_dedup` — the canonicalizer's individual rules pinned
  * on planted fetch variants (case, www, default port, trailing slash,
  * fragment, tracking-vs-real query params) plus keep-first semantics
  * and the window-not-join plan shape.
  */
class UrlDedupSpec extends SparkSpec {

  private def corpus(n: Int): String = {
    import spark.implicits._
    val dir = "target/tmp/urldedup"
    (0 until n)
      .map(i => (i.toLong, s"doc $i", "en", "synth", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C65 canonicalization: variants 0/2 collapse, the id= param survives") {
    val out = SparkEntry.queries("text_url_dedup")(spark, corpus(7))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // id 0 carries every mess at once: scheme+host case, www, trailing
    // slash, pure-tracking query, fragment — all must strip away.
    assert(out(0) == ((0L,
      "HTTPS://WWW.SITE0.COM/page/0/?utm_source=feed&ref=rss#top",
      "site0.com/page/0", 1L)))
    // id 1: http + :80 fold into the same identity BUT the real id=
    // param is kept while utm_campaign is stripped -> distinct resource.
    assert(out(1) == ((1L,
      "http://site0.com:80/page/0?id=0&utm_campaign=x",
      "site0.com/page/0?id=0", 1L)))
    // id 2 is the clean re-fetch of id 0's page: same canon, not kept.
    assert(out(2) == ((2L, "https://site0.com/page/0", "site0.com/page/0", 0L)))
    // page 1 repeats the pattern on its own identity; the partial page
    // 2 group (variant 0 alone) keeps its only member.
    assert(out.map(r => (r._1, r._3, r._4)).drop(3).toSeq == Seq(
      (3L, "site1.com/page/1", 1L),
      (4L, "site1.com/page/1?id=1", 1L),
      (5L, "site1.com/page/1", 0L),
      (6L, "site2.com/page/2", 1L)))
  }

  test("D29 stream frontier admits exactly batch C65's keep set") {
    val batch = SparkEntry.queries("text_url_dedup")(spark, sf())
      .collect().filter(_.getLong(3) == 1L)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val stream = SparkEntry.queries("text_url_dedup_stream")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(stream == batch && stream.nonEmpty)
  }

  test("C65 plan: keep-first is a window over the slim canon key, no join") {
    val df = SparkEntry.queries("text_url_dedup")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.contains("Window") && !p.contains("Join"),
      s"url dedup must not join the corpus against itself:\n$p")
  }
}
