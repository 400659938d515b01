package graft

import graft.SparkEntry

/** C35b `text_search_bm25` — hand-computed integer BM25 (k1 = 6/5,
  * b = 3/4) and the no-sort-merge-join plan contract.
  */
class Bm25Spec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/bm25-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C35b hand-computed scores: 22·tf·avgdl over 10·avgdl·tf + 3·avgdl + 9·dl") {
    // corpus: "x x y" / "x z" / "x y z" / "q"
    //   probe (df>=3): x (df=3); N=4; dl = 3,2,3,1; avgdl = 9 div 4 = 2
    //   idf_milli(x) = 4000 div 3 = 1333
    //   d0 (tf=2, dl=3): (1333·88)  div (40+6+27) = 117304 div 73 = 1606
    //   d1 (tf=1, dl=2): (1333·44)  div (20+6+18) =  58652 div 44 = 1333
    //   d2 (tf=1, dl=3): (1333·44)  div (20+6+27) =  58652 div 53 = 1106
    val out = SparkEntry.queries("text_search_bm25")(
        spark, corpus("hand", Seq("x x y", "x z", "x y z", "q")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("x", 1, 0L, 1606L), ("x", 2, 1L, 1333L), ("x", 3, 2L, 1106L)))
  }

  test("C35b length normalization: same tf, longer doc ranks strictly lower") {
    // d1 and d2 both carry tf(x)=1; d2 is longer, so its BM25 score must
    // be strictly below d1's — the correction C35's raw tf·idf lacks
    val out = SparkEntry.queries("text_search_bm25")(
        spark, corpus("norm", Seq("x x y", "x z", "x y z", "q")))
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(out(2L) < out(1L))
  }

  test("C35b plan: probe + postings broadcast — no join sort-merges, dl never shuffle-joins") {
    val df = SparkEntry.queries("text_search_bm25")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(!p.contains("SortMergeJoin"),
      s"every join must ride the probe/postings broadcasts — the corpus-wide " +
        s"doc-length table must never shuffle for a 20-term probe batch:\n$p")
    // the df table derives FROM tf (count(tf) anchors it to tf's
    // exchange), so the corpus tokenizes exactly once for the whole
    // index build — a second Generate in the FINAL (post-reuse) plan
    // means the derivation collapsed back into a raw-stream distinct
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1,
      s"tf + df must share ONE tokenize pass:\n$p")
  }
}
