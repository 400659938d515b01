package graft

import org.apache.spark.sql.functions._

import graft.functions.Kernels
import graft.queries.Tokenizer

/** C36d — unigram-LM tokenizer (Viterbi-EM). Load-bearing checks:
  * hand-computed Viterbi DP (costs, tie-break, backtrace) through the
  * kernel; greedy-witness semantics; seed substring counts; hard-EM
  * monotonicity + the three encoder properties via the gate query on
  * real data; and determinism of the encode output.
  */
class UnigramSpec extends SparkSpec {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def wfFrame(rows: Seq[(String, Long)]) = {
    val schema = StructType(Seq(
      StructField("t", StringType, nullable = false),
      StructField("freq", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (t, f) => Row(t, f) }: _*), schema)
  }

  test("viterbi kernel: picks the cheaper segmentation, exact cost") {
    // model: a=1.0, b=1.0, ab=1.5  → "abab" best = [ab, ab] cost 3.0
    // (char path costs 4.0)
    val m = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 1.5)
    val out = wfFrame(Seq("abab" -> 1L))
      .withColumn("vit", Kernels.unigramViterbi(m, 6)(col("t")))
      .select(col("vit._1"), col("vit._2")).head
    assert(out.getSeq[String](0) == Seq("ab", "ab"))
    assert(math.abs(out.getDouble(1) - 3.0) < 1e-12)
  }

  test("viterbi kernel: exact-tie breaks to the shortest-piece path") {
    // "ab" via chars costs 2.0, via piece "ab" costs 2.0 — tie; the
    // shortest-first strict-improvement rule keeps the char path
    val m = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 2.0)
    val out = wfFrame(Seq("ab" -> 1L))
      .withColumn("vit", Kernels.unigramViterbi(m, 6)(col("t")))
      .select(col("vit._1")).head
    assert(out.getSeq[String](0) == Seq("a", "b"))
  }

  test("greedy witness: longest-match path cost; null on dead end") {
    // greedy on "abab" takes ab|ab = 3.0 here; on "ba" it dead-ends
    // after "b" ("a" missing from model2)
    val m = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 1.5)
    val g = wfFrame(Seq("abab" -> 1L))
      .withColumn("g", Kernels.unigramGreedyCost(m, 6)(col("t"))).select(col("g")).head
    assert(math.abs(g.getDouble(0) - 3.0) < 1e-12)
    val m2 = Map("b" -> 1.0, "ba" -> 1.0)
    val g2 = wfFrame(Seq("bb" -> 1L, "ba" -> 1L, "bab" -> 1L, "bc" -> 1L))
      .withColumn("g", Kernels.unigramGreedyCost(m2, 6)(col("t")))
      .orderBy(col("t")).select(col("t"), col("g")).collect()
    // "ba" → [ba] 1.0; "bab" → "ba"+"b" = 2.0; "bb" → [b,b] 2.0;
    // "bc" → dead end at 'c' → null
    assert(g2.map(r => (r.getString(0), Option(r.get(1)))).toSeq ==
      Seq(("ba", Some(1.0)), ("bab", Some(2.0)), ("bb", Some(2.0)), ("bc", None)))
  }

  test("seed counts: hand-computed substring occurrences, freq-weighted") {
    // "aba" freq 2: substrings a,ab,aba,b,ba,a → a:4, b:2, ab:2, ba:2, aba:2
    val got = Tokenizer.unigramSeedCounts(wfFrame(Seq("aba" -> 2L)))
      .orderBy(col("p")).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 4L), ("ab", 2L), ("aba", 2L), ("b", 2L), ("ba", 2L)))
  }

  test("unigramTrain on a hand corpus: J monotone, model closed over usage") {
    val wf = wfFrame(Seq("abab" -> 10L, "aba" -> 5L, "b" -> 3L))
    val (model, js) = Tokenizer.unigramTrain(wf)
    assert(js.length == 4)
    js.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-6 * math.abs(a) - 1e-9, s"J decreased: $js")
    }
    // the trained model still segments every word; costs are positive
    assert(model.nonEmpty && model.values.forall(_ >= 0))
    val enc = wf.withColumn("vit", Kernels.unigramViterbi(model, 6)(col("t")))
      .select(col("t"), col("vit._1")).collect()
    enc.foreach(r => assert(r.getSeq[String](1).mkString("") == r.getString(0)))
  }

  test("inv_unigram_model: zero violations at sf0.001") {
    assert(SparkEntry.queries("inv_unigram_model")(spark, sf()).count() == 0)
  }

  test("text_unigram_encode: deterministic, words conserved, fertility sane") {
    val a = SparkEntry.queries("text_unigram_encode")(spark, sf()).collect()
    val b = SparkEntry.queries("text_unigram_encode")(spark, sf()).collect()
    assert(a.nonEmpty && a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // n_words per doc matches the corpus' own [a-z]+ word count
    val want = graft.core.Tables(spark, sf(), "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .where(col("t").rlike("^[a-z]+$"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      assert(r.getLong(1) == want(r.getLong(0)), s"doc ${r.getLong(0)} n_words")
      // fertility ≥ 1 token per word and ≤ max word length per word
      assert(r.getLong(3) >= 10000L && r.getLong(3) <= 10000L * 30)
    }
  }
}
