package graft

/** C68 `pipeline_dedup_cascade` — per-stage attribution on a planted
  * corpus, including the gating subtlety the operator exists for: a
  * url-killed doc must NOT win its exact-digest group downstream.
  */
class CascadeSpec extends SparkSpec {

  private def corpus(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = "target/tmp/cascade"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C68 attribution: url, exact, neardup and kept all assigned; stages gate") {
    val base12 = (0 until 12).map(i => f"w$i%02d").mkString(" ")
    val t1 = "alpha beta gamma delta"
    val t2 = "same body words here now"
    // page 0 = ids 0/1/2 (variants v0/v1/v2), page 1 = 3/4/5, page 2 = 6.
    val out = SparkEntry.queries("pipeline_dedup_cascade")(spark, corpus(Seq(
        base12,            // 0: url-keeps page 0 (v0 < v2); near-dup of 3
        t1,                // 1: own url (id= param); exact rep of {1, 6}
        t2,                // 2: url-dup of 0's page -> killed 'url'
        base12 + " extra", // 3: url-keeps page 1; near-dup of 0 -> 'neardup'
        t2,                // 4: survivor; its exact twin 2 was URL-killed,
                           //    so {4} is alone downstream -> KEPT (gating)
        t1,                // 5: url-dup of 3's page -> killed 'url'
        t1)))              // 6: survives url alone; exact-dup of 1 -> 'exact'
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (0L, "kept"), (1L, "kept"), (2L, "url"), (3L, "neardup"),
      (4L, "kept"), (5L, "url"), (6L, "exact")))
  }
}
