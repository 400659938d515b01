package graft

import org.apache.spark.sql.functions._

/** D19 `dedup_minhash_stream` — planted near-dups at ingest: the
  * paraphrased arrival drops, the unique/low-overlap/unbandable
  * arrivals keep. (Stream ≡ batch replay is the driver gate
  * `inv_minhash_stream_parity`; this spec pins the SEMANTICS.)
  */
class MinhashStreamSpec extends SparkSpec {

  test("D19 drops verified near-dups of the corpus, keeps everything else") {
    import spark.implicits._
    // absolute: the file-stream source resolves globs differently from
    // the batch reader for relative paths
    val dir = new java.io.File("target/tmp/minhash-stream").getAbsolutePath
    // corpus = ids % 3 != 0; arrivals = ids % 3 == 0
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"))
    val arrivals = Seq(
      // one appended token: 3-gram jaccard 8/9 = 0.889 >= 0.8 -> DROP
      (0L, "a b c d e f g h i j k"),
      // disjoint vocabulary -> KEEP
      (3L, "p q r s t u v w x y"),
      // 2 tokens: cannot band (needs >= 3 words) -> KEEP by absence
      (6L, "a b"),
      // shares only the first 5 tokens: jaccard 3/13 = 0.23 < 0.8 ->
      // KEEP even if a band-bucket coincidence nominates it
      (9L, "a b c d e z1 z2 z3 z4 z5"),
      // exact copy of corpus doc 2: jaccard 1 -> DROP
      (12L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"))
    // the stream source's pathGlobFilter matches FILE names: the real
    // testdata ships documents.parquet as a single FILE, so the fixture
    // must too (a Spark-written DIRECTORY of part files never matches)
    (corpus ++ arrivals)
      .map { case (id, t) => (id, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get.toPath
    java.nio.file.Files.copy(part,
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val keep = SparkEntry.queries("dedup_minhash_stream")(spark, dir)
      .collect().map(_.getLong(0))
    assert(keep.toSeq == Seq(3L, 6L, 9L))
  }

  test("D19 parity gate is empty on real data (the driver gate's own check)") {
    val v = SparkEntry.queries("inv_minhash_stream_parity")(spark, sf())
    assert(v.collect().isEmpty)
  }
}
