package graft

/** C61 `text_hash_embed` — hand-computed feature hashing: token "a"
  * hashes to h = 97·132 = 12804 → dim 4, sign +1; token "b" to
  * h = 12936 → dim 8, sign +1. Plus determinism and the map-not-join
  * plan contract.
  */
class HashEmbedSpec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/hashembed-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C61 hand-computed dims and signs; identical texts embed identically") {
    val out = SparkEntry.queries("text_hash_embed")(
        spark, corpus("hand", Seq("a a a", "a b", "a b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toMap).toMap
    assert(byDoc(0L)(4L) == 3L && byDoc(0L).values.sum == 3L) // "a" x3 -> dim 4
    assert(byDoc(1L)(4L) == 1L && byDoc(1L)(8L) == 1L)        // "a","b" -> dims 4, 8
    assert(byDoc(1L) == byDoc(2L))                            // determinism
    assert(byDoc(0L).keySet == (0L until 16L).toSet)          // dense 16 dims
  }

  test("C61 plan: embedding is a map — no aggregate, no join") {
    val plan = SparkEntry.queries("text_hash_embed")(
        spark, corpus("plan", Seq("a b")))
      .queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      s"expected a pure projection:\n$plan")
  }
}
