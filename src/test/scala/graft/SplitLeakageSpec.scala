package graft

/** C62 `text_split_leakage` — planted duplicates crossing the
  * deterministic split: val leaks via X and Z (2/2 = 10000 bp), test
  * leaks only via Z (1/2 = 5000 bp); whitespace/case variants of the
  * same text still count (normalized digest).
  */
class SplitLeakageSpec extends SparkSpec {

  test("C62 leak accounting per eval split, normalized match") {
    import spark.implicits._
    val dir = "target/tmp/leakage"
    val rows = Seq(
      (0L, "x x common text"),       // train, X
      (1L, "unique one"), (2L, "unique two"), (3L, "unique three"),
      (21L, "z z shared text"),      // train, Z
      (8L, "X  x common   text"),    // val — normalized dup of X (case+ws)
      (18L, "z z shared text"),      // val — dup of Z
      (9L, "eval only text"),        // test — clean
      (19L, "z z shared text"))      // test — dup of Z
    rows.map { case (id, t) => (id, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_split_leakage")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("test", 2L, 1L, 5000L),
      ("val", 2L, 2L, 10000L)))
  }
}
