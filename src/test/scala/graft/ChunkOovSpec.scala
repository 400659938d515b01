package graft

import org.apache.spark.sql.functions._

/** C55 `text_chunk_split` / C56 `text_oov_rate` — hand-computed chunk
  * boundaries (including the fencepost cases) and OOV arithmetic, plus
  * the map-side plan contracts.
  */
class ChunkOovSpec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/chunkoov-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(n: Int, from: Int = 0): String =
    (from until from + n).map(i => s"t$i").mkString(" ")

  test("C55 fenceposts: n=32 one chunk, n=33 two, n=56 two, n=57 three") {
    val out = SparkEntry.queries("text_chunk_split")(
        spark, corpus("fence", Seq(toks(32), toks(33), toks(56), toks(57))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, 32L),
      (1L, 0L, 0L, 32L), (1L, 1L, 24L, 9L),   // last chunk reaches token 33
      (2L, 0L, 0L, 32L), (2L, 1L, 24L, 32L),  // exactly fills [24,56)
      (3L, 0L, 0L, 32L), (3L, 1L, 24L, 32L), (3L, 2L, 48L, 9L)))
  }

  test("C55 chunk text: overlap carries the stride boundary tokens verbatim") {
    val out = SparkEntry.queries("text_chunk_split")(
        spark, corpus("text", Seq(toks(40))))
      .collect().map(r => (r.getLong(1), r.getString(4)))
    assert(out.toSeq == Seq(
      (0L, (0 until 32).map("t" + _).mkString(" ")),
      (1L, (24 until 40).map("t" + _).mkString(" "))))
    // the 8-token overlap appears in BOTH chunks
    val shared = (24 until 32).map("t" + _)
    assert(shared.forall(t => out(0)._2.split(" ").contains(t)
      && out(1)._2.split(" ").contains(t)))
  }

  test("C55 plan: pure explode projection — no join, no aggregate") {
    val df = SparkEntry.queries("text_chunk_split")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"chunking must stay map-side:\n$p")
  }

  test("D18 stream twin emits exactly the batch chunks (stateless parity)") {
    val batch = SparkEntry.queries("text_chunk_split")(spark, sf()).collect().toSeq
    val stream = SparkEntry.queries("text_chunk_split_stream")(spark, sf()).collect().toSeq
    assert(stream == batch)
  }

  test("C56 hand-computed OOV: rare words past top-K count as OOV") {
    // heads w00..w20 (21 words): docA holds each twice, docB repeats
    // w00 once more -> counts w00=3, w01..w20=2, zz1=zz2=1. Vocab =
    // top-20 by (count desc, word asc) = w00 + w01..w19 (w20 loses the
    // count-2 tie on name) -> OOV tokens are w20 (x2 in docA) and
    // zz1/zz2 (docB).
    val heads = (0 to 20).map(i => f"w$i%02d")
    val docA = (heads ++ heads).mkString(" ")       // every head twice
    val docB = s"${heads.head} zz1 zz2"             // 1 in-vocab, 2 OOV
    val out = SparkEntry.queries("text_oov_rate")(
        spark, corpus("oov", Seq(docA, docB)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // docA: 42 tokens, w20 x2 OOV -> 2*10000 div 42 = 476
    // docB: 3 tokens, w20+zz OOV -> 2*10000 div 3 = 6666
    assert(out.toSeq == Seq((0L, 42L, 2L, 476L), (1L, 3L, 2L, 6666L)))
  }

  test("C58 corpus diff: added/removed/changed classified; unchanged and absent silent") {
    val out = SparkEntry.queries("corpus_diff")(
        spark, corpus("diff", Seq(
          "same in both",   // id 0: v0+v1, equal -> no row
          "one",            // id 1: v0+v1, equal -> no row
          "removed text",   // id 2: %7=2 -> v0 only -> removed
          "marker text",    // id 3: %11=3 -> digests differ -> changed
          "added text",     // id 4: %5=4 -> v1 only -> added
          "five", "six", "seven", "eight",
          "neither")))      // id 9: %5=4 AND %7=2 -> in NO version
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((2L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("D20 stream twin scores against the frozen vocab identically to batch") {
    val batch = SparkEntry.queries("text_oov_rate")(spark, sf()).collect().toSeq
    val stream = SparkEntry.queries("text_oov_rate_stream")(spark, sf()).collect().toSeq
    assert(stream == batch)
  }

  private def langCorpus(name: String, docs: Seq[(String, String)]): String = {
    import spark.implicits._
    val dir = s"target/tmp/chunkoov-$name"
    docs.zipWithIndex
      .map { case ((t, l), i) => (i.toLong, t, l, "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C64 drift report: hand-computed shares, alert fires both directions") {
    // ids 0..3, 10 distinct non-stopword tokens each (qbp = 400+0+3000).
    // v0 = id%5!=4 (all) with id 3 (%11=3) marked " v0" -> 11 tokens;
    // v1 = id%7!=2 (drops id 2). v0: en 20 / fr 21 (tot 41); v1: en 10 /
    // fr 20 (tot 30) -> en share 4878->3333 (drift -1545), fr 5121->6666
    // (+1545): one lang alerts down, the other up, off the SAME corpus.
    val out = SparkEntry.queries("corpus_drift_report")(
        spark, langCorpus("drift", Seq(
          (toks(10), "en"), (toks(10, 10), "fr"),
          (toks(10, 20), "en"), (toks(10, 30), "fr"))))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
    // fr mq0: id1 qbp 3400, id3 v0-marked 11 tokens -> 440+0+3000 = 3440
    // -> (3400+3440) div 2 = 3420; every other mean stays 3400.
    assert(out.toSeq == Seq(
      ("en", 2L, 1L, 4878L, 3333L, -1545L, 3400L, 3400L, 0L, 1L),
      ("fr", 2L, 2L, 5121L, 6666L, 1545L, 3420L, 3400L, -20L, 1L)))
  }

  test("C71 confusion: correct, misrouted and und cells with per-lang shares") {
    val out = SparkEntry.queries("text_lang_confusion")(
        spark, langCorpus("confusion", Seq(
          ("the a x", "en"),   // routed en (correct)
          ("le la x", "en"),   // routed fr (misroute cell)
          ("le et y", "fr"),   // routed fr (correct)
          ("zz yy", "fr"))))   // no markers -> und
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("en", "en", 1L, 5000L), ("en", "fr", 1L, 5000L),
      ("fr", "fr", 1L, 5000L), ("fr", "und", 1L, 5000L)))
  }

  test("C64 drift report: identical distributions stay silent") {
    // ids 0/1 live in both versions unmarked -> zero drift, alert 0.
    val out = SparkEntry.queries("corpus_drift_report")(
        spark, langCorpus("nodrift", Seq((toks(10), "en"), (toks(10, 10), "fr"))))
      .collect()
      .map(r => (r.getString(0), r.getLong(5), r.getLong(8), r.getLong(9)))
    assert(out.toSeq == Seq(("en", 0L, 0L, 0L), ("fr", 0L, 0L, 0L)))
  }

  test("D28 stream twin emits the batch drift table identically") {
    val batch = SparkEntry.queries("corpus_drift_report")(spark, sf()).collect().toSeq
    val stream = SparkEntry.queries("corpus_drift_stream")(spark, sf()).collect().toSeq
    assert(stream == batch && batch.nonEmpty)
  }

  test("C56 plan: vocab broadcasts; no sort-merge join") {
    val df = SparkEntry.queries("text_oov_rate")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"the bounded top-K vocab must broadcast into the token stream:\n$p")
  }
}
