package graft

import org.apache.spark.sql.Row

import graft.SparkEntry

/** C37 `dedup_substring_spans` — hand-computed interval-union coverage,
  * and the structural case C25's disjoint chunks cannot see (a repeated
  * passage straddling a chunk boundary).
  */
class SubstringSpanSpec extends SparkSpec {

  /** Write an ad-hoc documents table (doc_id, text, lang, source,
    * n_chars) and return the dir the gate queries read from.
    */
  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/substrspan-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[Long, Row] =
    SparkEntry.queries("dedup_substring_spans")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("C37 shared 16-token passage: spans merge to exactly 16 covered tokens") {
    // doc0 = 30 unique tokens with tokens 5..20 replaced by a shared
    // passage; doc1 = the same passage inside different context.
    val shared = words("s", 16)
    val d0 = words("a", 5) ++ shared ++ words("b", 9)   // 30 tokens, passage at pos 5
    val d1 = words("c", 3) ++ shared ++ words("d", 11)  // 30 tokens, passage at pos 3
    val out = run(corpus("shared", Seq(d0.mkString(" "), d1.mkString(" "))))
    assert(out.keySet == Set(0L, 1L))
    // 16-token passage → 16-10+1 = 7 overlapping dup 10-grams; the 7
    // spans [p, p+10) .. [p+6, p+16) union to one 16-token interval.
    for ((id, pos) <- Seq(0L -> 5, 1L -> 3)) {
      val r = out(id)
      assert(r.getLong(1) == 30L, s"doc $id n_tokens")
      assert(r.getLong(2) == 7L, s"doc $id dup_gram_hits")
      assert(r.getLong(3) == 16L, s"doc $id covered (merged span, pos=$pos)")
      assert(r.getLong(4) == 16L * 10000 / 30, s"doc $id dup_frac_bp")
    }
  }

  test("C37 two disjoint repeated passages in one doc: coverage sums, spans don't bridge") {
    // doc0 carries passages X (12 tokens) and Y (10 tokens) separated by
    // unique filler; docs 1 and 2 each repeat one of them.
    val x = words("x", 12)
    val y = words("y", 10)
    val d0 = x ++ words("f", 8) ++ y                    // X at 0, Y at 20
    val d1 = words("g", 4) ++ x ++ words("h", 6)
    val d2 = words("k", 7) ++ y ++ words("m", 5)
    val out = run(corpus("disjoint", Seq(d0, d1, d2).map(_.mkString(" "))))
    val r0 = out(0L)
    // X → 3 dup grams covering 12; Y → 1 dup gram covering 10; disjoint.
    assert(r0.getLong(2) == 4L, "doc0 dup_gram_hits = 3 (X) + 1 (Y)")
    assert(r0.getLong(3) == 22L, "doc0 covered = 12 + 10, intervals not bridged")
    assert(out(1L).getLong(3) == 12L)
    assert(out(2L).getLong(3) == 10L)
  }

  test("C37 catches a chunk-straddling repeat that C25 dedup_chunks misses") {
    // A 10-token passage placed at offset 5 in both docs of one pair
    // (straddling the [0,10) / [10,20) chunk boundary in BOTH), with
    // distinct surroundings. Chunks never align → C25 sees nothing;
    // the overlapping gram at the passage start matches exactly.
    val p = words("p", 10)
    val d0 = words("u", 5) ++ p ++ words("v", 5)
    val d1 = words("w", 5) ++ p ++ words("z", 5)
    val dir = corpus("straddle", Seq(d0.mkString(" "), d1.mkString(" ")))
    val spans = run(dir)
    assert(spans.keySet == Set(0L, 1L))
    assert(spans(0L).getLong(3) == 10L && spans(1L).getLong(3) == 10L)
    val chunks = SparkEntry.queries("dedup_chunks")(spark, dir).collect()
    assert(chunks.isEmpty, "disjoint 10-chunks must miss the straddling repeat")
  }

  test("C37 fully-duplicated doc saturates at 10000 bp") {
    val t = words("q", 20).mkString(" ")
    val out = run(corpus("full", Seq(t, t)))
    assert(out.values.forall(r => r.getLong(3) == 20L && r.getLong(4) == 10000L))
  }

  // ---- C37b char grain ------------------------------------------------

  private def runChars(dir: String): Map[Long, Row] =
    SparkEntry.queries("dedup_substring_chars")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

  /** The case the published 50-char form exists for: a duplicated run
    * that word tokenization cannot see. Both docs embed the same
    * 60-char unsegmented blob (markup/CJK-ish: no spaces), but each doc
    * has far fewer than 10 word tokens — the word 10-gram operator
    * cannot emit a single gram for them, while the char grain reports
    * the full 60-char duplicated span.
    */
  test("C37b char-grain fires where word-grain structurally cannot") {
    val blob = (0 until 6).map(i => s"<tag$i-attr=v$i/>").mkString // 60+ chars, no spaces
    assert(!blob.contains(" ") && blob.length >= 60)
    val d0 = s"alpha $blob omega"   // 3 word tokens
    val d1 = s"beta gamma $blob"    // 3 word tokens
    val dir = corpus("charblob", Seq(d0, d1))
    val word = run(dir)
    assert(word.isEmpty, s"word 10-grams must not fire on <10-token docs: $word")
    val ch = runChars(dir)
    assert(ch.keySet == Set(0L, 1L), s"char grain must flag both docs: ${ch.keySet}")
    // the duplicated run is the blob plus its shared flanking spaces —
    // coverage must span at least the blob itself and stay inside the doc
    val l = blob.length.toLong
    for (id <- Seq(0L, 1L)) {
      val covered = ch(id).getLong(3)
      assert(covered >= l && covered <= ch(id).getLong(1),
        s"doc $id: covered=$covered must include the $l-char blob: ${ch(id)}")
      assert(ch(id).getLong(4) < 10000L, s"doc $id is not fully duplicated: ${ch(id)}")
    }
  }

  test("C37b hand-computed coverage: identical docs cover fully, singletons report nothing") {
    val t = ('a' to 'z').mkString * 3 // 78 chars
    val out = runChars(corpus("charfull", Seq(t, t, "short unique text")))
    assert(out.keySet == Set(0L, 1L), "the short unique doc reports nothing")
    out.values.foreach { r =>
      assert(r.getLong(1) == 78L && r.getLong(3) == 78L && r.getLong(4) == 10000L, r.toString)
    }
  }
}
