package graft

import org.apache.spark.sql.functions._

import graft.SparkEntry

/** C25b `text_remove_boilerplate` (detection → corpus REWRITE) and C18e
  * `pipeline_curate_shard` (curate → shuffle → shard composition) —
  * hand-built boilerplate grids and conservation properties against
  * independently-computed stage outputs.
  */
class BoilerplateSpec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/boiler-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // a 10-token chunk as a string, tokens "<tag>0".."<tag>9"
  private def chunk(tag: String): String = (0 until 10).map(tag + _).mkString(" ")

  test("C25b removes cross-doc duplicated chunks, keeps unique chunks and the tail in order") {
    // doc0 = BOILER + unique0 + tail  — loses chunk 0, keeps 1 + tail
    // doc1 = unique1 + BOILER         — loses chunk 1, keeps 0, no tail
    // doc2 = unique2 (no dup, >= 10 tokens) — NOT in the output
    // doc3 = "tiny doc" (< 10 tokens)       — excluded from the operator
    val boiler = chunk("nav")
    val dir = corpus("hand", Seq(
      s"$boiler ${chunk("u0")} tail0 tail1",
      s"${chunk("u1")} $boiler",
      chunk("u2"),
      "tiny doc"))
    val out = SparkEntry.queries("text_remove_boilerplate")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) == ((2L, 1L, s"${chunk("u0")} tail0 tail1")))
    assert(out(1L) == ((2L, 1L, chunk("u1"))))
  }

  test("C25b all-chunks-removed doc rewrites to its tail (or empty with no tail)") {
    val boiler = chunk("hdr")
    val dir = corpus("allgone", Seq(
      s"$boiler $boiler leftover",  // both chunks dup'd (cross-doc via doc1), tail kept
      boiler))                      // one chunk, fully removed, NO tail -> empty
    val out = SparkEntry.queries("text_remove_boilerplate")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((2L, 2L, "leftover")))
    assert(out(1L) == ((1L, 1L, "")))
  }

  test("C18e manifest conserves the curate train split exactly (docs and tokens)") {
    val dir = sf("sf0.001")
    val manifest = SparkEntry.queries("pipeline_curate_shard")(spark, dir).collect()
    assert(manifest.nonEmpty)
    // shards are contiguous from 0
    assert(manifest.map(_.getLong(0)).toSeq == manifest.indices.map(_.toLong))
    // independently recompute the surviving train split: quality filter
    // -> exact-dedup keep-first -> doc_id % 10 < 8
    val W = org.apache.spark.sql.expressions.Window
    val words = split(col("text"), " ")
    val q = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), size(words).cast("long").as("n_words"),
        size(array_distinct(words)).as("n_distinct"),
        size(filter(words, w => w.isin("the", "a", "of", "and", "to"))).as("n_stop"))
      .withColumn("quality_bp",
        (least(col("n_words"), lit(100)) * 40
          + expr("(least(n_stop * 10, n_words) * 3000) div n_words")
          + expr("(n_distinct * 3000) div n_words")).cast("long"))
      .where(col("quality_bp") >= 5000)
      .withColumn("rn", row_number().over(
        W.partitionBy(unhex(sha2(
          lower(regexp_replace(trim(col("text")), "\\s+", " ")), 256))).orderBy(col("doc_id"))))
      .where(col("rn") === 1 && col("doc_id") % 10 < 8)
      .agg(count(lit(1)), sum(col("n_words"))).head
    assert(manifest.map(_.getLong(1)).sum == q.getLong(0), "every surviving doc sharded once")
    assert(manifest.map(_.getLong(2)).sum == q.getLong(1), "token mass conserved")
    // every shard except the last opens before the budget boundary:
    // cumulative tokens BEFORE shard k must be < (k+1)*4096
    val cum = manifest.map(_.getLong(2)).scanLeft(0L)(_ + _)
    manifest.zipWithIndex.foreach { case (r, i) =>
      assert(cum(i) < (r.getLong(0) + 1) * 4096L, s"shard ${r.getLong(0)} opens past its budget window")
    }
  }
}
