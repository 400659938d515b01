package graft

/** C67 `text_quality_sweep` and C1c `dedup_cluster_stats` — the two
  * calibration/data-card tables, hand-computed on planted corpora,
  * plus their bounded-shuffle plan contracts.
  */
class QualitySweepSpec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/sweep-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C67 sweep: cumulative keep counts/tokens per threshold, hand-computed") {
    // qbp: "the a x y" -> 160+3000+3000 = 6160 (bucket 6000);
    //      "x x x x"   -> 160+0+750    =  910 (bucket 500);
    //      "the a of and to b" -> 240+3000+3000 = 6240 (bucket 6000).
    val out = SparkEntry.queries("text_quality_sweep")(
        spark, corpus("grid", Seq("the a x y", "x x x x", "the a of and to b")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // threshold 500 keeps all 3 docs / 14 tokens; 6000 keeps the two
    // good docs (6666 bp) / 10 tokens (7142 bp).
    assert(out.toSeq == Seq(
      (500L, 3L, 14L, 10000L, 10000L),
      (6000L, 2L, 10L, 6666L, 7142L)))
  }

  test("C67 plan: bucket agg is partial; totals broadcast; no sort-merge") {
    val df = SparkEntry.queries("text_quality_sweep")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.contains("partial_") && p.contains("Broadcast")
        && !p.contains("SortMergeJoin"),
      s"sweep must partial-agg the corpus and broadcast the 1-row totals:\n$p")
  }

  test("C1c cluster stats: per-size histogram with exact excess tokens") {
    // cluster of 3 ("a b c"), cluster of 2 via whitespace/case variants
    // ("j k" / "  J K  " both normalize to "j k"), singleton of 4 words.
    val out = SparkEntry.queries("dedup_cluster_stats")(
        spark, corpus("hist", Seq(
          "a b c", "a b c", "a b c",
          "j k", "  J K  ",
          "f g h i")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 0L, 4L, 0L),   // the singleton: 4 tokens, no excess
      (2L, 1L, 2L, 1L, 4L, 2L),   // normalized variants count 2+2 tokens
      (3L, 1L, 3L, 2L, 9L, 6L)))  // 3 copies x 3 tokens -> 6 removable
  }

  test("C70 novelty: shared grams counted once, short docs excluded") {
    val out = SparkEntry.queries("text_ngram_novelty")(
        spark, corpus("novel", Seq(
          "p q r s",     // grams {p q r, q r s}; "p q r" shared with doc 1
          "x p q r y",   // grams {x p q, p q r, q r y}
          "u v w",       // 1 unique gram
          "m n m n m",   // repeated INTERNAL gram stays one distinct gram
          "a b")))       // < 3 words -> no row
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 5000L),
      (1L, 3L, 1L, 6666L),
      (2L, 1L, 0L, 10000L),
      (3L, 2L, 0L, 10000L)))
  }

  test("C1c plan: two aggregates, no join, text never shuffles") {
    val df = SparkEntry.queries("dedup_cluster_stats")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(!p.contains("Join"), s"histogram must not join:\n$p")
    assert(p.contains("partial_count"),
      s"the digest agg must be map-side combinable:\n$p")
  }
}
