package graft

import graft.SparkEntry

/** C38 `text_lm_score` — hand-computed bigram conditional probabilities
  * and the integer-exactness bounds the gate relies on.
  */
class LmScoreSpec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/lmscore-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C38 hand-computed conditional probabilities: p(w2|w1) = c2/cp in bp") {
    // corpus: "a b a b" and "a c"
    //   bigram counts: (a,b)=2 (b,a)=1 (a,c)=1; prefix totals: a=3, b=1
    //   p(a,b) = 20000 div 3 = 6666; p(b,a) = 10000; p(a,c) = 3333
    val out = SparkEntry.queries("text_lm_score")(spark, corpus("hand", Seq("a b a b", "a c")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((3L, 6666L + 10000L + 6666L, 23332L / 3)))
    assert(out(1L) == ((1L, 3333L, 3333L)))
  }

  test("C38 lm_bp is bounded to [0, 10000] and covers every >=2-token doc on real data") {
    val dir = sf("sf0.001")
    val out = SparkEntry.queries("text_lm_score")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 10000L))
    val eligible = graft.core.Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("size(split(text, ' ')) >= 2")).count()
    assert(out.length.toLong == eligible, "one score row per eligible document")
  }

  test("C38 a doc duplicated verbatim scores 10000 when its bigrams appear nowhere else") {
    // every bigram in the duplicated doc is deterministic given its
    // prefix (all prefix occurrences continue identically), so every
    // conditional probability is exactly 1.
    val out = SparkEntry.queries("text_lm_score")(spark,
        corpus("dup", Seq("p q r s t", "p q r s t", "u v u w")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) == 10000L && out(1L) == 10000L)
    assert(out(2L) < 10000L, "mixed-continuation prefixes score below 1")
  }
}
