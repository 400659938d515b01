package graft

import org.apache.spark.sql.functions._

/** C51 `text_domain_reputation` — hand-computed per-domain verdicts
  * (every branch of the decision), and the sliver/plan contract.
  */
class DomainReputationSpec extends SparkSpec {

  // doc_id % 10 < 6 → .com. Text fixtures are chosen so the quality
  // rule (least(n_words,100)*40 + stopcap + distinct share) lands on
  // the wanted side of RepQualityMin = 5300.
  private def frame(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("C51 verdicts: thin, low_quality, duplicated, keep — every branch fires") {
    // srcA.com: 2 docs → thin (below RepMinDocs=3), whatever their text.
    // srcB.com: 3 copies of the same low-variety text → duplicated
    //   (dup_bp = 10000) AND high enough quality to reach that branch:
    //   "the a of and to x" → n=6, stop=5, distinct=6 →
    //   240 + (min(50,6)*3000)/6 + 3000 = 240+3000+3000 = 6240 ≥ 5300.
    // srcC.com: 3 distinct all-same-word docs ("x x x x") → n=4,
    //   distinct=1, stop=0 → 160 + 0 + 750 = 910 < 5300 → low_quality.
    // srcD.com: 3 distinct stopword-rich docs (same shape as srcB but
    //   unique) → 6240, no dups → keep.
    val d = frame(Seq(
      (10L, "srcA", "the a of and to x"), (20L, "srcA", "the a of and to y"),
      (30L, "srcB", "the a of and to z"), (40L, "srcB", "the a of and to z"),
      (50L, "srcB", "the a of and to z"),
      (60L, "srcC", "x x x x"), (70L, "srcC", "y y y y"), (80L, "srcC", "z z z z"),
      (90L, "srcD", "the a of and to q"), (100L, "srcD", "the a of and to w"),
      (110L, "srcD", "the a of and to e")))
    val out = graft.queries.Text.domainReputation(d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      ("srcA.com", 2L, 6240L, 0L, "thin"),
      ("srcB.com", 3L, 6240L, 10000L, "duplicated"),
      ("srcC.com", 3L, 910L, 0L, "low_quality"),
      ("srcD.com", 3L, 6240L, 0L, "keep")))
  }

  test("C51 dup share counts CORPUS-wide duplicates, not domain-local ones") {
    // the duplicate pair straddles two domains: both domains' single
    // copy must still count as duplicated (the digest appears >1 times
    // corpus-wide) — a domain-local groupBy would miss both.
    val d = frame(Seq(
      (10L, "srcA", "the a of and to z"), (20L, "srcA", "the a of and to y"),
      (30L, "srcA", "the a of and to x"),
      (40L, "srcB", "the a of and to z"), (50L, "srcB", "the a of and to v"),
      (60L, "srcB", "the a of and to u")))
    val out = graft.queries.Text.domainReputation(d)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(out == Map("srcA.com" -> 3333L, "srcB.com" -> 3333L))
  }

  test("C51 plan: dup sliver rides the adaptive semi join; no sort-merge") {
    val df = SparkEntry.queries("text_domain_reputation")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"reputation joins are slim post-agg rows + the adaptive sliver:\n$p")
    assert(p.contains("LeftSemi"), s"dup docs must be a semi join:\n$p")
  }
}
