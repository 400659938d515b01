package graft

import org.apache.spark.sql.functions._

import graft.queries.Text

/** C49 — fuzzy decontamination. The load-bearing case: a benchmark
  * item paraphrased by editing EVERY 4TH WORD carries ZERO exact
  * 4-grams (each 4-window holds an edit), so C21-class exact matching
  * provably sees no signal — asserted inline on the planted pair — yet
  * the fuzzy matcher flags it through the benchmark-side containment
  * decision (3-gram survival of that edit pattern is exactly 1/4, and
  * the 0.20 floor sits under it). Plus a near-dup bench copy caught by
  * the Jaccard decision, span-output arithmetic, and a clean doc.
  */
class FuzzyDecontamSpec extends SparkSpec {

  // doc 0 (bench): 48 unique words. doc 1 (train): every 4th word
  // replaced by a novel token. doc 20 (bench): 30 words; doc 2 (train):
  // the same 30 plus one appended. doc 3 (train): unrelated filler.
  private def corpus() = {
    import spark.implicits._
    val b0 = (0 until 48).map(i => s"b$i")
    val para = b0.zipWithIndex.map { case (w, i) => if (i % 4 == 0) s"m$i" else w }
    val b20 = (0 until 30).map(i => s"c$i")
    val near = b20 :+ "extra"
    val filler = (0 until 40).map(i => s"f$i")
    Seq(
      (0L, b0.mkString(" ")),
      (1L, para.mkString(" ")),
      (20L, b20.mkString(" ")),
      (2L, near.mkString(" ")),
      (3L, filler.mkString(" "))).toDF("doc_id", "text")
  }

  test("the every-4th-word paraphrase shares ZERO exact 4-grams with its benchmark source") {
    val d = corpus()
    val g4 = d.select(col("doc_id"),
      explode(graft.functions.Kernels.gramsN(split(col("text"), " "), 4)).as("g"))
    val shared = g4.where(col("doc_id") === 1)
      .join(g4.where(col("doc_id") === 0).select(col("g")), "g")
      .count()
    assert(shared == 0L,
      s"exact 4-gram matching saw $shared shared grams — the planted paraphrase is broken")
  }

  test("fuzzy matcher flags the paraphrase (containment) and the near-dup (jaccard), not the clean doc") {
    val out = Text.fuzzyDecontam(corpus()).orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L), s"flagged docs: ${out.keySet}")

    // doc 1: 12 of 46 bench 3-grams survive (windows starting ≡1 mod 4)
    val p = out(1L)
    assert(p.getLong(3) == 12L * 10000 / 46, s"cont_bp: ${p.getLong(3)}") // max_cont_bp
    assert(p.getLong(2) < 7000, "paraphrase must NOT pass the jaccard bar")
    // 12 disjoint [pos, pos+3) spans → 36 removed of 48
    assert(p.getLong(4) == 48L && p.getLong(5) == 36L && p.getLong(6) == 12L,
      s"span output: ${p.toSeq}")

    // doc 2: 28 shared grams, train has 29 → jacc = 28/29
    val n = out(2L)
    assert(n.getLong(2) == 28L * 10000 / 29, s"jacc_bp: ${n.getLong(2)}")
    // hits at 0..27 cover [0, 30) of 31 tokens — only "extra" survives
    assert(n.getLong(4) == 31L && n.getLong(6) == 1L, s"span output: ${n.toSeq}")
  }
}
