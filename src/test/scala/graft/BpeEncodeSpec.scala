package graft

import org.apache.spark.sql.functions._

import graft.functions.Kernels
import graft.queries.Tokenizer

/** C36c corpus BPE encode (tokenizer INFERENCE): hand-computed
  * encodings, the greedy-overlap rule, kernel ≡ sequential
  * mergePair-replay equality (the rank-priority loop must produce
  * exactly what applying the merges one-per-pass in learned order
  * produces — the equivalence bpeEncodeDocs' scaladoc argues), the
  * canonical-form violation check on a corrupted encoder, and the
  * per-doc fertility operator end-to-end on sf0.001.
  */
class BpeEncodeSpec extends SparkSpec {

  private def encodeOne(word: String, merges: Seq[(String, String)]): Seq[String] = {
    import spark.implicits._
    Seq(word).toDF("t")
      .select(Kernels.bpeEncode(merges)(col("t")).as("toks"))
      .collect()(0).getSeq[String](0)
  }

  test("hand-computed encodings under merges [(a,b), (ab,c)]") {
    val m = Seq(("a", "b"), ("ab", "c"))
    assert(encodeOne("abab", m) == Seq("ab", "ab"))
    assert(encodeOne("abc", m) == Seq("abc"))
    assert(encodeOne("cab", m) == Seq("c", "ab"))
    assert(encodeOne("ba", m) == Seq("b", "a"))
    assert(encodeOne("aab", m) == Seq("a", "ab"))
    assert(encodeOne("x", m) == Seq("x"))
    assert(encodeOne("abcab", m) == Seq("abc", "ab"))
  }

  test("rank priority: an earlier merge consumes symbols a later merge wanted") {
    // rank 0 (b,c) beats rank 1 (a,b): "abc" merges (b,c) first, then
    // (a,b) finds no pair — [a, bc], never [ab, c]
    val m = Seq(("b", "c"), ("a", "b"))
    assert(encodeOne("abc", m) == Seq("a", "bc"))
    assert(encodeOne("abcb", m) == Seq("a", "bc", "b"))
  }

  test("greedy left-to-right overlap rule matches the trainer's mergePair") {
    val m = Seq(("a", "a"))
    assert(encodeOne("aaa", m) == Seq("aa", "a"))
    assert(encodeOne("aaaa", m) == Seq("aa", "aa"))
    assert(encodeOne("baaab", m) == Seq("b", "aa", "a", "b"))
  }

  test("kernel equals sequential mergePair replay on a trained merge table") {
    import spark.implicits._
    // enough structure for 10 real merges: repeated stems + suffixes
    val vocab = Seq(
      ("lower", 5L), ("lowest", 2L), ("newer", 6L), ("wider", 3L),
      ("low", 7L), ("new", 4L), ("wide", 2L), ("widest", 1L),
      ("aaaa", 3L), ("aaab", 2L), ("banana", 2L), ("bandana", 1L))
      .toDF("t", "freq")
    val merges = Tokenizer.bpeTrainFromVocab(vocab, 10)
      .map { case (_, a, b, _) => (a, b) }
    assert(merges.size == 10)
    val kernel = Tokenizer.bpeEncodeTable(vocab, merges)
      .select(col("t"), col("toks")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // replay: one mergePair projection per merge, in learned order
    var v = vocab.select(col("t"), split(col("t"), "").as("syms"))
    merges.foreach { case (a, b) =>
      v = v.select(col("t"), Tokenizer.mergePair(a, b))
    }
    val replayed = v.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(kernel == replayed)
  }

  test("canonical-form gate: green on the real encoder, violations on a corrupted one") {
    val viols = Tokenizer.bpeEncodeViolations(spark, sf("sf0.001"), 10)
    assert(viols.isEmpty, s"unexpected violations: ${viols.collect().mkString(", ")}")

    // corrupted encoder: stop one merge short — words whose full
    // encoding needed the last merge now carry its pair adjacent
    import spark.implicits._
    val wf = Seq(("aaab", 3L), ("ab", 2L), ("bb", 1L)).toDF("t", "freq")
    val merges = Tokenizer.bpeTrainFromVocab(wf, 10)
      .map { case (_, a, b, _) => (a, b) }
    val truncated = Tokenizer.bpeEncodeTable(wf, merges.dropRight(2))
    // "aaab" under all merges = [aaab-stem] via (a,a),(a,b),(aa,ab);
    // dropping (aa,ab),(b,b) leaves [aa, ab] — pair (aa,ab) IS learned
    val enc = truncated.where(col("t") === "aaab")
      .select(col("toks")).collect()(0).getSeq[String](0)
    assert(enc == Seq("aa", "ab"))
  }

  test("text_bpe_encode: per-doc fertility on sf0.001, bounds and join consistency") {
    val dir = sf("sf0.001")
    val out = SparkEntry.queries("text_bpe_encode")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, t, f) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w >= 1, s"doc with zero kept words must drop: $r")
      assert(t >= w, s"BPE can only split words, never cross them: $r")
      assert(f == t * 10000L / w, s"fertility must be the exact integer ratio: $r")
      assert(f >= 10000L, s"fertility is >= 1 token/word in bp: $r")
    }
  }
}
