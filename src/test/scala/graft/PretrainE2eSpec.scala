package graft

/** C83 `pipeline_pretrain_e2e` — one planted casualty PER STAGE of the
  * end-to-end chain (the CascadeSpec discipline corpus-wide): benchmark
  * reserve, quality, url, exact, neardup, contaminated, mixture, and
  * kept docs with hand-derived shard/block attribution. Every expected
  * value below is derived from first principles (quality formula, canon
  * rule, 3-gram Jaccard, span union, the mixture integer arithmetic,
  * md5 shard order) — never by running the implementation.
  */
class PretrainE2eSpec extends SparkSpec {

  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = "target/tmp/pretrain_e2e"
    rows.map { case (id, t, lang) => (id, t, lang, "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // deterministic coin shared with C19/C24/C29/C42b (keepCoin(10000))
  private def coin(id: Long): Long =
    ((id % 1000003L) * 131071L + 99991L) % 1000003L % 10000L

  test("C83: every stage kills its planted casualty; kept docs get shard/block attribution") {
    // benchmark text: 12 distinct words (2 stopwords) — id 0 reserves
    // it, id 13 quotes it verbatim (the contamination plant)
    val bt = "the quick brown fox jumps of benchmark item alpha beta gamma delta"
    val e = "the of alpha one two three four five six seven eight nine" // exact pair
    val b = "the of nd1 nd2 nd3 nd4 nd5 nd6 nd7 nd8 nd9 nd10" // neardup base
    def xxDoc(id: Long): String = // 500 words: 5 stopwords + 495 unique
      "the a of and to " + (1 to 495).map(j => s"x${id}w$j").mkString(" ")
    val dir = corpus(Seq(
      (0L, bt, "en"),                 // benchmark reserve (0 % 20 = 0)
      (1L, e, "en"),                  // exact-pair keeper (min id wins)
      (3L, "the a k3a k3b k3c k3d k3e k3f k3g k3h k3i k3j", "en"), // url keeper (v0 page 1)
      (4L, b, "en"),                  // neardup CC label (kept)
      (5L, "the a k5a k5b k5c k5d k5e k5f k5g k5h k5i k5j", "en"), // v2 page 1 -> 'url'
      (6L, "x x x x", "en"),          // quality_bp 910 -> 'quality'
      (7L, e, "en"),                  // digest twin of 1 -> 'exact'
      (10L, b + " extra", "en"),      // jaccard 10/11 vs 4 -> 'neardup'
      (13L, bt, "en"),                // every 4-gram in the probe -> 'contaminated'
      (16L, xxDoc(16), "xx"),         // coin 7121 >= rate 4420 -> 'mixture'
      (19L, xxDoc(19), "xx"),         // coin 334 -> kept, 1 copy
      (22L, xxDoc(22), "xx")))        // coin 3547 -> kept, 1 copy
    // mixture arithmetic (hand-derived): en survivors 1/3/4 = 36 clean
    // tokens, xx survivors 16/19/22 = 1500; budget 768, w 6/38, wsum 44
    // -> rate_en 28888 bp (2 copies + coin<8888), rate_xx 4420 bp
    assert(coin(16) == 7121L && coin(19) == 334L && coin(22) == 3547L)
    assert(Seq(1L, 3L, 4L).forall(coin(_) < 8888L)) // all en keepers draw 3 copies
    // shard prefix (md5 order): 19 (1f0e..) < 4 (a87f..) < 22 (b6d7..)
    // < 1 (c4ca..) < 3 (eccb..); toks 500/36/500/36/36 -> pre
    // 0/500/536/1036/1072, all inside shard 0; first_block = pre%4096/512
    val out = SparkEntry.queries("pipeline_pretrain_e2e")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, "benchmark", -1L, -1L, -1L, -1L),
      (1L, "kept", 12L, 3L, 0L, 2L),
      (3L, "kept", 12L, 3L, 0L, 2L),
      (4L, "kept", 12L, 3L, 0L, 0L),
      (5L, "url", -1L, -1L, -1L, -1L),
      (6L, "quality", -1L, -1L, -1L, -1L),
      (7L, "exact", -1L, -1L, -1L, -1L),
      (10L, "neardup", -1L, -1L, -1L, -1L),
      (13L, "contaminated", 0L, -1L, -1L, -1L),
      (16L, "mixture", 500L, 0L, -1L, -1L),
      (19L, "kept", 500L, 1L, 0L, 0L),
      (22L, "kept", 500L, 1L, 0L, 1L)))
  }
}
