package graft

import graft.SparkEntry

/** C50 `text_search_rrf` — hand-computed reciprocal-rank fusion of the
  * milli-idf and BM25 rankers, and the shared-index plan contract.
  */
class RrfSpec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/rrf-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C50 fused order differs from BOTH input rankers (genuine fusion)") {
    // corpus: d0 = 3x 'x' padded with 11 'f' fillers (tf-heavy but LONG),
    // d1/d2/d3 = "x y"/"x z"/"x q" (tf=1, short). probe (df>=3): x (df=4).
    // N=4; dl = 14,2,2,2; avgdl = 20 div 4 = 5; idf_milli = 4000 div 4 = 1000.
    //   ranker A (tf*idf): d0 s=3000 r1; d1/d2/d3 s=1000 -> r2/r3/r4 by id
    //   ranker B (BM25):   d0 = (1000*330) div (150+15+126) = 1134 -> r4
    //                      d1/d2/d3 = (1000*110) div (50+15+18) = 1325 -> r1/r2/r3
    //   contributions 1000000 div (60+r): r1 16393, r2 16129, r3 15873, r4 15625
    //   fused: d1 32522 > d0 32018 > d2 32002 > d3 31498
    // — A puts d0 FIRST, B puts d0 LAST, the fusion lands it second:
    // neither ranker's order survives verbatim, which is the point of RRF.
    val out = SparkEntry.queries("text_search_rrf")(
        spark, corpus("hand", Seq(
          "x x x f f f f f f f f f f f", "x y", "x z", "x q")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("x", 1, 1L, 32522L), ("x", 2, 0L, 32018L),
      ("x", 3, 2L, 32002L), ("x", 4, 3L, 31498L)))
  }

  test("C50 a doc ranked by only ONE ranker's pool still fuses (no inner join)") {
    // d0 tf=2 short, plus 21 tf=1 docs: ranker pools are top-20 — the
    // 21st tf=1 doc falls out of at least one pool, yet every pooled doc
    // must carry at least one contribution (union semantics, never an
    // inner join that would demand membership in BOTH pools).
    val texts = "x x" +: (1 to 21).map(i => s"x w$i")
    val out = SparkEntry.queries("text_search_rrf")(
        spark, corpus("pool", texts))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // d0 wins both rankers: 2x the r1 contribution
    assert(out.head == ((1, 0L, 32786L)))
    assert(out.length == 5) // top-5 emitted
    // every fused score is at least one single-ranker tail contribution
    assert(out.forall(_._3 >= 1000000L / (60 + 20)))
  }

  test("C50 plan: ONE tokenize pass feeds both rankers; no join sort-merges") {
    val df = SparkEntry.queries("text_search_rrf")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1,
      s"both rankers must share the tf exchange — a second Generate means " +
        s"the fusion re-tokenized the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"every join must ride the probe/postings broadcasts:\n$p")
  }
}
