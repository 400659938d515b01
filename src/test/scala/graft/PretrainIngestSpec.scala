package graft

/** D36 `pipeline_pretrain_ingest` — one planted arrival PER STAGE of
  * the ingest-time chain (the PretrainE2eSpec discipline at the stream
  * boundary): benchmark reserve, quality, url, exact, neardup,
  * contaminated, and a kept arrival. Every expected value is derived
  * from first principles (quality formula, canon rule, 3-gram Jaccard,
  * span union) — never by running the implementation. The kept arrival
  * doubles as the COMPOSITION witness: it shares its canon with a
  * corpus doc that died at the corpus's own quality stage, so a probe
  * index built from raw corpus canons (instead of the cascade-retained
  * set pretrainCascade computes) would wrongly kill it as 'url'.
  */
class PretrainIngestSpec extends SparkSpec {

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    // absolute path + single-FILE documents.parquet: the file-stream
    // source's pathGlobFilter matches file names (the MinhashStreamSpec
    // fixture discipline — a Spark-written DIRECTORY never matches)
    val dir = new java.io.File("target/tmp/pretrain_ingest").getAbsolutePath
    rows.map { case (id, t) => (id, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get.toPath
    java.nio.file.Files.copy(part,
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("D36: every stage disposes its planted arrival; quality-dead corpus canon does not block") {
    // benchmark text: 12 words, 2 stopwords (the/of) -> quality 6480
    val bt = "the quick brown fox jumps of benchmark item alpha beta gamma delta"
    val e = "the of alpha one two three four five six seven eight nine"
    val b = "the of nd1 nd2 nd3 nd4 nd5 nd6 nd7 nd8 nd9 nd10"
    val dir = corpus(Seq(
      // corpus side (doc_id % 7 not in {2,4}):
      (0L, bt),   // benchmark reserve (0 % 20 = 0) -> excluded from retained
      (1L, e),    // retained: the exact-probe digest holder
      (8L, b),    // retained: the neardup-probe text (canon site2.com/page/2)
      (20L, "y y y y"), // quality 910 -> DIES corpus-side; canon site6.com/page/6
      (21L, "the a u21a u21b u21c u21d u21e u21f u21g u21h u21i u21j"),
      // arrivals (doc_id % 7 in {2,4}):
      (2L, "x x x x"),  // quality 910 -> 'quality'
      (4L, e),          // digest of retained 1 -> 'exact' (canon ?id=1 is distinct)
      (9L, b + " extra"), // jaccard 10/11 vs retained 8 -> 'neardup'
      (16L, bt),        // every 4-gram in the frozen probe (doc 0) -> 'contaminated'
      (18L, "the a w18a w18b w18c w18d w18e w18f w18g w18h w18i w18j"),
      // 18 shares canon site6.com/page/6 with quality-dead corpus 20 -> KEPT
      (23L, "the a v23a v23b v23c v23d v23e v23f v23g v23h v23i v23j"),
      // 23 shares canon site7.com/page/7 with RETAINED corpus 21 -> 'url'
      (60L, bt)))       // 60 % 20 = 0 -> 'benchmark' (60 % 7 = 4 arrives)
    val out = SparkEntry.queries("pipeline_pretrain_ingest")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.toSeq == Seq(
      (2L, "quality", -1L),
      (4L, "exact", -1L),
      (9L, "neardup", -1L),
      (16L, "contaminated", 0L),
      (18L, "kept", 12L),
      (23L, "url", -1L),
      (60L, "benchmark", -1L)))
  }
}
