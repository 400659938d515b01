package graft

/** C63 `text_quality_budget_select` — hand-computed budget cuts:
  * qbp(10 words, d distinct, s stopwords) = 400 + min(10s,10)·300 +
  * d·300. Keeps the best docs until the half-token budget fills, and
  * breaks quality ties by doc_id.
  */
class QualityBudgetSpec extends SparkSpec {

  private def corpus(name: String, rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = s"target/tmp/qbudget-$name"
    rows.map { case (id, t) => (id, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C63 budget cut: best two of four kept, realized cutoff reported") {
    val hi = "the w1 w2 w3 w4 w5 w6 w7 w8 w9"      // qbp 6400
    val mid = "the w1 w2 w3 w4 w5 w6 w7 w8 w8"     // qbp 6100
    val low = "v1 v1 v2 v2 v3 v3 v4 v4 v5 v5"      // qbp 1900
    val lowest = "x x x x x x x x x x"              // qbp 700
    val out = SparkEntry.queries("text_quality_budget_select")(
        spark, corpus("cut", Seq((0L, hi), (1L, mid), (2L, low), (3L, lowest))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // budget = 40 div 2 = 20 tokens -> hi (run 10) + mid (run 20) kept
    assert(out.toSeq == Seq(("en", 2L, 20L, 20L, 6100L)))
  }

  test("C63 equal quality breaks ties by doc_id") {
    val a = "the a1 a2 a3 a4 a5 a6 a7 a8 a9"       // qbp 6400
    val b = "the b1 b2 b3 b4 b5 b6 b7 b8 b9"       // qbp 6400
    val low = "x x x x x x x x x x"
    val out = SparkEntry.queries("text_quality_budget_select")(
        spark, corpus("tie", Seq((0L, a), (1L, b), (2L, low))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // budget = 30 div 2 = 15 -> only doc 0 fits (run 10; +doc 1 = 20 > 15)
    assert(out.toSeq == Seq(("en", 1L, 10L)))
  }
}
