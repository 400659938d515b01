package graft

/** C60 `text_gopher_rules` — each planted doc fails exactly one rule
  * (the attribution property the flag battery exists for), plus one
  * doc that passes all five.
  */
class GopherRulesSpec extends SparkSpec {

  private def corpus(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = "target/tmp/gopher"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def w5(n: Int, tag: String): Seq[String] = (0 until n).map(i => f"$tag$i%03d") // len 5

  test("C60 rule attribution: one failing rule per planted doc") {
    // A: all pass — n=30, mwl=(3+1+28*5)*100/30=480, stop=2, top=1/30, distinct=30/30
    val a = (Seq("the", "a") ++ w5(28, "aa")).mkString(" ")
    // B: fails r_len only — n=10 (< 20), mwl=(3+1+8*5)*100/10=440
    val b = (Seq("the", "a") ++ w5(8, "bb")).mkString(" ")
    // C: fails r_mwl only — 28 distinct len-2 words: mwl=(3+1+56)*100/30=200 < 420
    val c2 = (Seq("the", "a") ++ (0 until 28).map(i => s"${('b' + i).toChar}x")).mkString(" ")
    // D: fails r_stop only — no stopwords; 15 len-4 + 15 len-5 -> mwl=450
    val d = ((0 until 15).map(i => f"cc$i%02d") ++ w5(15, "dd")).mkString(" ")
    // E: fails r_rep only — "eeee0" x5 of 30 -> top_bp=1666; mwl=(25+3+1+23*5)*100/30=480
    val e = (Seq.fill(5)("eee00") ++ Seq("the", "a") ++ w5(23, "ee").drop(0)).mkString(" ")
    // F: fails r_div only — n=80, 14 distinct (1750bp < 3200), max count 9 (1125bp <= 1200),
    //    mwl=(27+9+270+40)*100/80=432, stop: the x9, a x9
    val f = (Seq.fill(9)("the") ++ Seq.fill(9)("a")
      ++ (0 until 6).flatMap(i => Seq.fill(9)(f"ff$i%03d"))
      ++ w5(8, "fg")).mkString(" ")

    val out = SparkEntry.queries("text_gopher_rules")(spark, corpus(Seq(a, b, c2, d, e, f)))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)), r.getLong(11)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, (1L, 1L, 1L, 1L, 1L), 1L),
      (1L, (0L, 1L, 1L, 1L, 1L), 0L),
      (2L, (1L, 0L, 1L, 1L, 1L), 0L),
      (3L, (1L, 1L, 0L, 1L, 1L), 0L),
      (4L, (1L, 1L, 1L, 0L, 1L), 0L),
      (5L, (1L, 1L, 1L, 1L, 0L), 0L)))
  }

  test("C66 ablation: per-rule counts/alone-counts/token mass hand-computed") {
    // Reuse the attribution corpus: docs B..F each fail EXACTLY one rule
    // (so n_flagged = n_flagged_alone = 1 per rule) and A passes all —
    // tokens_flagged per rule = the failing doc's n_words (10/30/30/30/80).
    val a = (Seq("the", "a") ++ w5(28, "aa")).mkString(" ")
    val b = (Seq("the", "a") ++ w5(8, "bb")).mkString(" ")
    val c2 = (Seq("the", "a") ++ (0 until 28).map(i => s"${('b' + i).toChar}x")).mkString(" ")
    val d = ((0 until 15).map(i => f"cc$i%02d") ++ w5(15, "dd")).mkString(" ")
    val e = (Seq.fill(5)("eee00") ++ Seq("the", "a") ++ w5(23, "ee")).mkString(" ")
    val f = (Seq.fill(9)("the") ++ Seq.fill(9)("a")
      ++ (0 until 6).flatMap(i => Seq.fill(9)(f"ff$i%03d"))
      ++ w5(8, "fg")).mkString(" ")
    val out = SparkEntry.queries("pipeline_filter_ablation")(
        spark, corpus(Seq(a, b, c2, d, e, f)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("any", 5L, 5L, 180L),
      ("diversity", 1L, 1L, 80L),
      ("length", 1L, 1L, 10L),
      ("mean_word_len", 1L, 1L, 30L),
      ("repetition", 1L, 1L, 30L),
      ("stopwords", 1L, 1L, 30L)))
  }

  test("C66 plan: one partial aggregate, no join, no token explode") {
    val df = SparkEntry.queries("pipeline_filter_ablation")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    // the only Generate allowed is stack() over the ONE aggregate row —
    // a Generate below the aggregate would be a token explode.
    assert(!p.contains("Join"), s"ablation must not join:\n$p")
    assert(p.contains("partial_") && p.contains("Exchange SinglePartition"),
      s"the 1-row aggregate must be map-side combinable:\n$p")
    assert(p.indexOf("Generate") < p.indexOf("HashAggregate"),
      s"stack must sit above the aggregate, not explode below it:\n$p")
  }

  test("D27 stream twin judges every doc exactly as batch C60") {
    val batch = SparkEntry.queries("text_gopher_rules")(spark, sf()).collect().toSeq
    val stream = SparkEntry.queries("text_gopher_rules_stream")(spark, sf()).collect().toSeq
    assert(stream == batch)
  }

  test("C60 plan: pure projection — no aggregate exchange before the sort") {
    val plan = SparkEntry.queries("text_gopher_rules")(spark, corpus(Seq("the a x y")))
      .queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(!plan.contains("HashAggregate"), s"unexpected aggregate in:\n$plan")
  }
}
