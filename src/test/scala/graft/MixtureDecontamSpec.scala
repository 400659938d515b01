package graft

import org.apache.spark.sql.Row

/** C42 `text_mixture_schedule` + C43 `text_decontaminate_spans` —
  * hand-computed schedules and planted contamination spans.
  */
class MixtureDecontamSpec extends SparkSpec {

  /** Ad-hoc documents table with EXPLICIT doc_ids (C43 needs control of
    * the doc_id % 20 probe membership) and per-doc (source, lang).
    */
  private def corpus(name: String, rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = s"target/tmp/mixdecon-$name"
    // the driver's testdata ships documents.parquet as a FLAT FILE, and
    // the streaming twins' pathGlobFilter matches leaf file names — so
    // flatten Spark's part-file directory into the same layout
    rows.map { case (id, t, lang, src) => (id, t, lang, src, t.length.toLong) }
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
    dir
  }

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  // ---- C42 ----------------------------------------------------------

  private def schedule(dir: String): Map[(String, String), Row] =
    SparkEntry.queries("text_mixture_schedule")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

  test("C42 hand-computed two-stratum schedule: sqrt weights, exact integer allocation") {
    // stratum A: 1 doc x 100 tokens; stratum B: 4 docs x 100 tokens = 400.
    // w = (10, 20), wsum = 30, budget = 500/2 = 250.
    // allocA = 250*10/30 = 83, rateA = 83*10000/100 = 8300
    // allocB = 250*20/30 = 166, rateB = 166*10000/400 = 4150
    val t100 = words("w", 100).mkString(" ")
    val dir = corpus("two", Seq(
      (1L, t100, "en", "a"),
      (2L, t100, "fr", "b"), (3L, t100, "fr", "b"),
      (4L, t100, "fr", "b"), (5L, t100, "fr", "b")))
    val out = schedule(dir)
    assert(out.keySet == Set("a" -> "en", "b" -> "fr"))
    val a = out("a" -> "en"); val b = out("b" -> "fr")
    assert(a.getLong(2) == 1L && a.getLong(3) == 100L && a.getLong(4) == 10L)
    assert(a.getLong(5) == 83L && a.getLong(6) == 8300L)
    assert(b.getLong(2) == 4L && b.getLong(3) == 400L && b.getLong(4) == 20L)
    assert(b.getLong(5) == 166L && b.getLong(6) == 4150L)
  }

  test("C42 low-resource stratum upsamples past one epoch (rate_bp > 10000)") {
    // A: 36 tokens, B: 3600 tokens. w = (6, 60), wsum = 66,
    // budget = 3636/2 = 1818. allocA = 1818*6/66 = 165,
    // rateA = 165*10000/36 = 45833 — the stratum repeats ~4.6 epochs.
    val dir = corpus("upsample", Seq(
      (1L, words("a", 36).mkString(" "), "is", "web")) ++
      (2L to 37L).map(i => (i, words(s"b$i-", 100).mkString(" "), "en", "web")))
    val out = schedule(dir)
    val a = out("web" -> "is")
    assert(a.getLong(4) == 6L && a.getLong(5) == 165L)
    assert(a.getLong(6) == 45833L, "low-resource stratum must repeat (rate > 10000 bp)")
    assert(out("web" -> "en").getLong(6) < 10000L)
  }

  test("C42 budget conservation: sum(alloc) <= budget < sum(alloc) + #strata") {
    val dir = sf("sf0.001")
    val rows = SparkEntry.queries("text_mixture_schedule")(spark, dir).collect()
    val totTokens = rows.map(_.getLong(3)).sum
    val budget = totTokens / 2
    val allocSum = rows.map(_.getLong(5)).sum
    assert(allocSum <= budget, "floor-division allocation can never exceed the budget")
    assert(budget < allocSum + rows.length,
      "each stratum drops < 1 token to floor division")
  }

  test("C42b apply realizes the schedule: whole-epoch copies + deterministic fractional coin") {
    // the upsample corpus: stratum A (36 tokens, 1 doc id=1) gets
    // rate_bp 45833 -> 4 whole copies + coin extra. doc 1's coin =
    // ((1 % 1000003)*131071 + 99991) % 1000003 % 10000 = 231062 % 10000
    // = 1062 < 5833 -> 5 copies, 5*36 = 180 tokens sampled.
    val dir = corpus("apply", Seq(
      (1L, words("a", 36).mkString(" "), "is", "web")) ++
      (2L to 37L).map(i => (i, words(s"b$i-", 100).mkString(" "), "en", "web")))
    val out = SparkEntry.queries("text_mixture_apply")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val a = out("web" -> "is")
    assert(a.getLong(2) == 45833L, "rate_bp carried through")
    assert(a.getLong(3) == 5L, "4 whole epochs + the fractional coin hit")
    assert(a.getLong(4) == 180L, "tokens_sampled = copies * tokens")
    // downsampled stratum: 0 whole copies, kept subset only
    val b = out("web" -> "en")
    assert(b.getLong(3) > 0L && b.getLong(3) < 36L,
      "fractional-rate stratum keeps a strict subset")
    assert(b.getLong(4) == b.getLong(3) * 100L, "every b-doc is 100 tokens")
  }

  test("D9 stream decontamination equals batch on a planted corpus") {
    val x = words("x", 6)
    val dir = corpus("stream", Seq(
      (0L, (words("p", 4) ++ x ++ words("q", 4)).mkString(" "), "en", "bench"),
      (1L, (words("u", 5) ++ x ++ words("v", 19)).mkString(" "), "en", "web"),
      (2L, words("z", 30).mkString(" "), "en", "web")))
    val batch = SparkEntry.queries("text_decontaminate_spans")(spark, dir)
      .collect().map(_.toSeq).toSet
    val stream = SparkEntry.queries("text_decontaminate_stream")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(stream == batch, s"stream $stream != batch $batch")
    assert(batch.nonEmpty)
  }

  test("D13 stream mixture apply ≡ batch C42b row-for-row (shared body, real data)") {
    val dir = sf("sf0.001")
    val batch = SparkEntry.queries("text_mixture_apply")(spark, dir).collect().toSeq
    val stream = SparkEntry.queries("text_mixture_apply_stream")(spark, dir).collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  // ---- C43 ----------------------------------------------------------

  private def decontam(dir: String): Map[Long, Row] =
    SparkEntry.queries("text_decontaminate_spans")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("C43 planted benchmark quote: exact span removed, clean doc untouched") {
    // doc 0 (probe: 0 % 20 == 0) carries passage X of 6 tokens -> 3
    // distinct 4-grams. doc 1 quotes X inside 24 unique tokens; doc 2 is
    // clean. The 3 hit spans [5,9) [6,10) [7,11) union to 6 tokens.
    val x = words("x", 6)
    val probe = words("p", 4) ++ x ++ words("q", 4)
    val d1 = words("u", 5) ++ x ++ words("v", 19)
    val d2 = words("z", 30)
    val dir = corpus("quote", Seq(
      (0L, probe.mkString(" "), "en", "bench"),
      (1L, d1.mkString(" "), "en", "web"),
      (2L, d2.mkString(" "), "en", "web")))
    val out = decontam(dir)
    assert(out.keySet == Set(1L), "only the contaminated training doc surfaces")
    val r = out(1L)
    assert(r.getLong(1) == 30L, "n_tokens")
    assert(r.getLong(2) == 3L, "probe_hits: 3 overlapping 4-grams of the 6-token quote")
    assert(r.getLong(3) == 6L, "removed = union of overlapping hit spans")
    assert(r.getLong(4) == 24L, "clean_tokens = n_tokens - removed")
    assert(r.getLong(5) == 6L * 10000 / 30, "removed_bp")
  }

  test("C43 fully-quoted training doc removes everything (clean_tokens = 0)") {
    val t = words("s", 12).mkString(" ")
    val dir = corpus("full", Seq(
      (20L, t, "en", "bench"), // probe: 20 % 20 == 0
      (3L, t, "en", "web")))
    val out = decontam(dir)
    val r = out(3L)
    assert(r.getLong(3) == 12L && r.getLong(4) == 0L && r.getLong(5) == 10000L)
  }

  test("C43 two disjoint quotes in one doc: spans sum, gap survives") {
    // Quotes X (5 tokens -> 2 grams) and Y (4 tokens -> 1 gram) from two
    // different probe docs, separated by 6 unique tokens.
    val x = words("x", 5); val y = words("y", 4)
    val d = words("a", 3) ++ x ++ words("g", 6) ++ y ++ words("b", 2)
    val dir = corpus("disjoint", Seq(
      (0L, (words("p", 4) ++ x).mkString(" "), "en", "bench"),
      (40L, (y ++ words("q", 4)).mkString(" "), "en", "bench"),
      (7L, d.mkString(" "), "en", "web")))
    val r = decontam(dir)(7L)
    assert(r.getLong(2) == 3L, "2 grams of X + 1 gram of Y")
    assert(r.getLong(3) == 9L, "removed = 5 + 4, intervals not bridged")
    assert(r.getLong(4) == 11L, "the unique middle + edges survive")
  }
}
