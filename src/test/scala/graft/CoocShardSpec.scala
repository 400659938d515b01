package graft

import org.apache.spark.sql.functions._

import graft.SparkEntry

/** C44 `text_cooccurrence_pmi`, C45 `text_shard_manifest`, and D10
  * `text_lm_score_stream` — hand-computed oracles for the window/PMI
  * arithmetic and the prefix-sum shard assignment, the two-level-vs-
  * naive prefix parity, and stream≡batch LM-score parity.
  */
class CoocShardSpec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/coocshard-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C44 window-2 pairs, canonicalization, and the PMI ratio by hand") {
    // five docs "p q r": window-2 pairs per doc = (p,q), (q,r), (p,r) —
    // the (p,r) distance-2 pair is the window's reason to exist; each
    // reaches exactly the cxy >= 5 support floor. Unigrams p=q=r=5,
    // N=15, so every pair scores (5*15*10000) div (5*5) = 30000; the
    // tie breaks on (wa, wb) ascending.
    val out = SparkEntry.queries("text_cooccurrence_pmi")(
        spark, corpus("hand", Seq.fill(5)("p q r")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("p", "q", 5L, 5L, 5L, 30000L),
      ("p", "r", 5L, 5L, 5L, 30000L),
      ("q", "r", 5L, 5L, 5L, 30000L)))
  }

  test("C44 unordered canonical pairs count both directions; sub-support pairs drop") {
    // "a b a b a b a b a b": adjacent pairs alternate (a,b)/(b,a) —
    // canonicalization folds them into one (a,b) type with cxy=9; the
    // distance-2 (a,a) and (b,b) pairs (4 each) fall below support 5.
    // The 1-token doc "x" contributes N but no pairs (and no crash).
    // N = 11, so pmi_bp = (9*11*10000) div (5*5) = 39600.
    val out = SparkEntry.queries("text_cooccurrence_pmi")(
        spark, corpus("canon", Seq("a b a b a b a b a b", "x")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(("a", "b", 9L, 5L, 5L, 39600L)))
  }

  test("C45 shard assignment by EXCLUSIVE prefix: a straddling doc stays in its start shard") {
    // four 1500-token docs; md5 order of ids is 1 < 2 < 0 < 3
    // (c4ca < c81e < cfcd < eccb). Exclusive prefixes 0/1500/3000/4500:
    // doc 0 STARTS at 3000 < 4096, so it belongs to shard 0 even though
    // it ends at 4500 — the straddle contract; doc 3 opens shard 1.
    val t1500 = Seq.fill(1500)("w").mkString(" ")
    val out = SparkEntry.queries("text_shard_manifest")(
        spark, corpus("straddle", Seq(t1500, t1500, t1500, t1500)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    def h(id: Int) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    assert(out.toSeq == Seq(
      (0L, 3L, 4500L, h(1), h(0)),
      (1L, 1L, 1500L, h(3), h(3))))
  }

  test("C45 two-level bucketed prefix sum equals the naive global-window form") {
    // the scale-correct 256-bucket decomposition must be EXACTLY the
    // single-partition global cumsum it replaces — same shards, same
    // stats, on real (irregular-length) data
    val dir = sf("sf0.001")
    val W = org.apache.spark.sql.expressions.Window
    val naive = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      .withColumn("pre", coalesce(
        sum(col("tokens")).over(
          W.orderBy(col("h"), col("doc_id")).rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
      .select(expr("pre div 4096").as("shard"), col("tokens"), col("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tokens"),
        min(col("h")).as("first_h"), max(col("h")).as("last_h"))
      .orderBy(col("shard"))
      .collect().toSeq
    val bucketed = SparkEntry.queries("text_shard_manifest")(spark, dir)
      .collect().toSeq
    assert(bucketed.nonEmpty && bucketed == naive)
  }

  test("D10 stream LM scoring ≡ batch C38 row-for-row (self-scored corpus)") {
    val dir = sf("sf0.001")
    val batch = SparkEntry.queries("text_lm_score")(spark, dir).collect().toSeq
    val stream = SparkEntry.queries("text_lm_score_stream")(spark, dir).collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }
}
