package graft

import org.apache.spark.sql.functions._

/** C54 `pipeline_curate_web` — a hand-planted corpus where every stage
  * of the composed pipeline visibly removes something: blocklist,
  * per-domain cap, reputation (both low-quality and duplicated domain
  * verdicts), per-doc quality floor, and exact dedup keep-first.
  */
class PipelineWebSpec extends SparkSpec {

  private val good = "the a of and to " // + 1 unique token -> qbp 6240
  private val bad = "x x x x"           // qbp 910

  /** Writes the 18-doc hand corpus (every stage removes something) and
    * returns its dir — shared by the C54, C73 and D24 tests, idempotent.
    */
  private def handCorpus(): String = {
    import spark.implicits._
    val dir = "target/tmp/web-hand"
    // all ids are multiples of 10 (%10 = 0 -> .com domains, 'train')
    val rows =
      // srcA.com: 10 docs -> cap trims ids 80/90; id 10 duplicates id 0
      // (keep-first); id 20 fails the per-doc quality floor. Reputation
      // on the RAW domain: mean (9*6240+910)/10 = 5707 >= 5100, dup
      // share 2000 bp NOT > 2000 -> keep.
      // NOTE: the low-quality doc must be UNIQUE corpus-wide — reusing
      // srcB's "x x x x" would make it a cross-domain duplicate and
      // push srcA's dup share to 3000 bp (> 2000 -> domain dropped)
      Seq((0L, good + "z"), (10L, good + "z"), (20L, "u u u u"),
        (30L, good + "b"), (40L, good + "c"), (50L, good + "d"),
        (60L, good + "e"), (70L, good + "f"), (80L, good + "g"),
        (90L, good + "h")).map { case (i, t) => (i, t, "srcA") } ++
      // srcB.com: 3 low-quality docs -> whole domain low_quality
      Seq((100L, bad), (110L, "y y y y"), (120L, "z z z z"))
        .map { case (i, t) => (i, t, "srcB") } ++
      // srcC.com: good quality but 2 of 3 are copies -> dup share
      // 6666 bp > 2000 -> whole domain dropped as duplicated
      Seq((200L, good + "q"), (210L, good + "q"), (220L, good + "r"))
        .map { case (i, t) => (i, t, "srcC") } ++
      // src7.com is on the blocklist: perfect docs, still dropped
      Seq((130L, good + "m"), (140L, good + "n"))
        .map { case (i, t) => (i, t, "src7") }
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C54 every stage acts: block, cap, reputation, quality, dedup") {
    val out = SparkEntry.queries("pipeline_curate_web")(spark, handCorpus())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // survivors: srcA ids 0,30,40,50,60,70 — six 17-char docs
    assert(out.toSeq == Seq(("train", "en", 6L, 102L)))
  }

  test("C73 waterfall: every stage's removal attributed on the hand corpus") {
    // reuses the C54 fixture written by the test above (18 docs):
    // blocklist -2 (src7), cap -2 (srcA 80/90), reputation -6
    // (srcB low-quality + srcC duplicated), quality -1 (id 20),
    // dedup -1 (id 10 copies id 0) -> 6 survivors.
    val out = SparkEntry.queries("pipeline_curate_web_ablation")(
        spark, handCorpus())
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.map(x => (x._1, x._2, x._4)).toSeq == Seq(
      ("raw", 18L, 0L), ("blocklist", 16L, 2L), ("domain_cap", 14L, 2L),
      ("reputation", 8L, 6L), ("quality", 7L, 1L), ("dedup", 6L, 1L)))
    // token conservation: stage removals sum to raw minus kept
    assert(out.map(_._5).sum == out.head._3 - out.last._3)
    assert(out.tail.forall(_._5 > 0L), "every stage must remove token mass")
  }

  test("D24 stream admission reproduces batch on the hand corpus") {
    import spark.implicits._
    val dir = "target/tmp/web-hand-stream"
    val rows =
      Seq((0L, good + "z"), (10L, good + "z"), (20L, "u u u u"),
        (30L, good + "b"), (40L, good + "c"), (50L, good + "d"),
        (60L, good + "e"), (70L, good + "f"), (80L, good + "g"),
        (90L, good + "h")).map { case (i, t) => (i, t, "srcA") } ++
      Seq((100L, bad), (110L, "y y y y"), (120L, "z z z z"))
        .map { case (i, t) => (i, t, "srcB") } ++
      Seq((200L, good + "q"), (210L, good + "q"), (220L, good + "r"))
        .map { case (i, t) => (i, t, "srcC") } ++
      Seq((130L, good + "m"), (140L, good + "n"))
        .map { case (i, t) => (i, t, "src7") }
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_docs_tmp")
    val tmp = new java.io.File(s"$dir/_docs_tmp")
    val part = tmp.listFiles().find(f => f.getName.startsWith("part-") &&
      f.getName.endsWith(".parquet")).get
    val flat = new java.io.File(s"$dir/documents.parquet")
    if (flat.isDirectory) { flat.listFiles().foreach(_.delete()); flat.delete() }
    java.nio.file.Files.copy(part.toPath, flat.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles().foreach(_.delete()); tmp.delete()

    val batch = SparkEntry.queries("pipeline_curate_web")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val stream = SparkEntry.queries("pipeline_curate_web_stream")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(batch == Seq(("train", "en", 6L, 102L)) && stream == batch)
  }

  test("C54 plan: every domain-level table joins bounded; no sort-merge") {
    val df = SparkEntry.queries("pipeline_curate_web")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(!p.contains("SortMergeJoin"),
      s"blocklist/over-cap/reputation sets ride broadcast or shuffle-hash:\n$p")
    // both rank windows (domain cap rk<=8, dedup rn=1) must carry the
    // partial WindowGroupLimit: rows beyond the limit die MAP-SIDE
    // before the window shuffle — the property that keeps the cap
    // exchange a sliver at crawl scale
    assert(p.linesIterator.count(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial")) == 2,
      s"rank-limit pushdown must prune both windows map-side:\n$p")
  }
}
