package graft

/** C84 `pipeline_pretrain_compact` — one planted increment doc per
  * disposition, including both `vs` rungs of every cascade stage and
  * the two contract-defining witnesses: (1) a quality-dead corpus
  * canon does NOT block an increment arrival (the probe index is the
  * cascade-RETAINED set, the D36/PretrainIngestSpec composition
  * witness at the compaction boundary); (2) a benchmark item that
  * ARRIVED IN THE INCREMENT scrubs an increment doc — the probe
  * UPDATE semantics that distinguish compaction from D36's frozen
  * ingest probe. Every expected value hand-derived (quality formula,
  * canon rule, 3-gram Jaccard, staged min-id rules, span union,
  * mixture integer arithmetic, md5 shard order) — never by running
  * the implementation.
  */
class PretrainCompactSpec extends SparkSpec {

  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    // absolute path + single-FILE documents.parquet so the SAME fixture
    // also drives D36's file-stream source in the monotone-gate test
    // (the MinhashStreamSpec discipline)
    val dir = new java.io.File("target/tmp/pretrain_compact").getAbsolutePath
    rows.map { case (id, t, lang) => (id, t, lang, "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get.toPath
    java.nio.file.Files.copy(part,
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  // deterministic coin shared with C19/C24/C29/C42b (keepCoin(10000))
  private def coin(id: Long): Long =
    ((id % 1000003L) * 131071L + 99991L) % 1000003L % 10000L

  private lazy val fixtureDir: String = {
    val bt = "the quick brown fox jumps of benchmark item alpha beta gamma delta"
    val bt2 = "the of bench two item kappa lambda mu nu xi omicron pi"
    val e = "the of alpha one two three four five six seven eight nine"
    val b = "the of nd1 nd2 nd3 nd4 nd5 nd6 nd7 nd8 nd9 nd10"
    val c = "the of m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"
    val t16 = "the of q16a q16b q16c q16d q16e q16f q16g q16h q16i q16j"
    def xxDoc(id: Long): String = // 500 words: 5 stopwords + 495 unique
      "the a of and to " + (1 to 495).map(j => s"x${id}w$j").mkString(" ")
    corpus(Seq(
      // corpus side (doc_id % 7 not in {2,4}):
      (0L, bt, "en"),        // corpus benchmark (probe item A)
      (1L, e, "en"),         // retained en
      (8L, b, "en"),         // retained en (neardup-probe text)
      (15L, xxDoc(15), "xx"), // retained xx; coin 6050 >= rate 4326 -> 0 copies
      (19L, xxDoc(19), "xx"), // retained xx; coin 334 -> 1 copy
      (20L, "y y y y", "en"), // quality 910 -> DIES corpus-side (canon site6/page6)
      (21L, "the a u21a u21b u21c u21d u21e u21f u21g u21h u21i u21j", "en"),
      // increment (doc_id % 7 in {2,4}):
      (2L, "x x x x", "en"),   // quality 910 -> 'quality'
      (4L, e, "en"),           // digest of retained 1 -> ('exact','corpus')
      (9L, b + " extra", "en"), // jaccard 10/11 vs retained 8 -> ('neardup','corpus')
      (11L, "the a z11a z11b z11c z11d z11e z11f z11g z11h z11i z11j", "en"),
      // 11 shares canon site3/page3 with increment 9 (min-id 9 wins the
      // within-increment url window) -> ('url','increment') — even
      // though 9 itself later dies neardup: the STAGED rule (C79/C68)
      (16L, t16, "en"),        // exact-group min within increment -> kept
      (18L, "the a w18a w18b w18c w18d w18e w18f w18g w18h w18i w18j", "en"),
      // 18 shares canon site6/page6 with quality-dead corpus 20 -> kept
      (23L, "the a v23a v23b v23c v23d v23e v23f v23g v23h v23i v23j", "en"),
      // 23 shares canon site7/page7 with RETAINED corpus 21 -> ('url','corpus')
      (25L, c, "en"),          // neardup pair with 30; min-id CC label -> kept
      (30L, c + " extra", "en"), // jaccard 10/11 vs 25 -> ('neardup','increment')
      (37L, bt, "en"),         // every 4-gram in corpus probe item A -> 'contaminated'
      (39L, bt2, "en"),        // covered ONLY by increment-arrived probe item 60 -> 'contaminated'
      (44L, t16, "en"),        // digest twin of 16, min-id 16 wins -> ('exact','increment')
      (46L, xxDoc(46), "xx"),  // coin 9239 >= rate_xx 4326 -> 'mixture'
      (60L, bt2, "en")))       // 60 % 20 = 0 -> 'benchmark' (and probe item B)
  }

  test("C84: every disposition fires; retained-set probes and probe-update semantics hold") {
    val dir = fixtureDir
    // mixture arithmetic (hand-derived): merged kept = retained corpus
    // {1,8,15,19,21} + increment kept {16,18,25}; en strata 6 docs x 12
    // clean = 72 tokens, xx = 1500; budget 786, w_sqrt 8/38, wsum 46
    // -> rate_en 18888 bp (1 copy + coin<8888), rate_xx 4326 bp
    assert(coin(46) == 9239L && coin(15) == 6050L && coin(19) == 334L)
    assert(Seq(1L, 8L, 21L, 16L, 25L).forall(coin(_) < 8888L)) // 2 copies each
    assert(coin(18) == 9263L) // 1 copy
    // shard prefix (md5 order over merged kept): 19(500) < 21(24) <
    // 18(12) < 25(24) < 1(24) < 16(24) < 8(24) -> increment kept docs
    // 16/18/25 all land in shard 0, first_block 1
    val out = SparkEntry.queries("pipeline_pretrain_compact")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) "-" else r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6)))
    assert(out.toSeq == Seq(
      (2L, "quality", "-", -1L, -1L, -1L, -1L),
      (4L, "exact", "corpus", -1L, -1L, -1L, -1L),
      (9L, "neardup", "corpus", -1L, -1L, -1L, -1L),
      (11L, "url", "increment", -1L, -1L, -1L, -1L),
      (16L, "kept", "-", 12L, 2L, 0L, 1L),
      (18L, "kept", "-", 12L, 1L, 0L, 1L),
      (23L, "url", "corpus", -1L, -1L, -1L, -1L),
      (25L, "kept", "-", 12L, 2L, 0L, 1L),
      (30L, "neardup", "increment", -1L, -1L, -1L, -1L),
      (37L, "contaminated", "-", 0L, -1L, -1L, -1L),
      (39L, "contaminated", "-", 0L, -1L, -1L, -1L),
      (44L, "exact", "increment", -1L, -1L, -1L, -1L),
      (46L, "mixture", "-", 500L, 0L, -1L, -1L),
      (60L, "benchmark", "-", -1L, -1L, -1L, -1L)))
  }

  test("D36/C84 monotone gate: empty, while compaction visibly tightens") {
    val dir = fixtureDir
    // the gate: no doc the ingest pass dropped reaches mixture/kept in
    // the compaction fold
    val inv = SparkEntry.queries("inv_pretrain_ingest_compact_monotone")(spark, dir)
    assert(inv.collect().isEmpty)
    // non-vacuity: the TIGHTENING direction actually occurs on this
    // corpus — D36 admits these provisionally, C84 kills them:
    // 11/44/30 at the within-increment rungs, 39 via the probe UPDATE
    // (its benchmark twin 60 arrived in the increment, invisible to
    // D36's frozen probe), 46 at the mixture stage D36 doesn't run
    val ing = SparkEntry.queries("pipeline_pretrain_ingest")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Seq(11L, 44L, 30L, 39L, 46L).forall(ing(_) == "kept"))
  }
}
