package graft

import org.apache.spark.sql.functions._

/** C52 `text_topic_tag` — hand-computed taxonomy argmax (tie-break,
  * zero-hit fallback, score arithmetic) and the no-join/no-agg plan
  * contract that makes the tag free at 100 TB.
  */
class TopicTagSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, text) => (id, text, "en", "synth", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("C52 argmax, tie-break by topic name ASC, zero hits -> other") {
    val out = SparkEntry.queries("text_topic_tag")(spark, {
      val dir = "target/tmp/topic-hand"
      frame(Seq(
        // 3 exec hits vs 1 storage hit -> exec; score 3*10000 div 5 = 6000
        (0L, "join hash sort row x"),
        // 2 exec vs 2 storage vs 2 stream: tie -> 'exec' (name ASC)
        (1L, "join hash row table stream window"),
        // query-only winner
        (2L, "query filter filter z"),
        // no taxonomy word at all -> other, hits 0, score 0
        (3L, "foo bar baz"),
        // tie between query and storage (no exec): 'query' wins
        (4L, "query key row scan")))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, "exec", 3L, 6000L),
      (1L, "exec", 2L, 3333L),
      (2L, "query", 3L, 7500L),
      (3L, "other", 0L, 0L),
      (4L, "query", 2L, 5000L)))
  }

  test("C52 plan: no join, no aggregate — the tag is a pure projection") {
    val df = SparkEntry.queries("text_topic_tag")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(!p.contains("Join"), s"taxonomy is literal arrays, never a join:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"no aggregation anywhere — per-row argmax only:\n$p")
    // the ONLY exchange is the presentation sort
    assert(p.linesIterator.count(_.contains("Exchange")) <= 1,
      s"one rangepartitioning exchange at most (ORDER BY doc_id):\n$p")
  }

  test("C57 strata conserve the corpus and reuse the C52 argmax verbatim") {
    import org.apache.spark.sql.functions.{col => c}
    val mix = SparkEntry.queries("text_mixture_topic")(spark, sf()).collect()
    val tags = SparkEntry.queries("text_topic_tag")(spark, sf()).collect()
    // doc conservation: every doc lands in exactly one (topic, lang) cell
    assert(mix.map(_.getLong(2)).sum == tags.length)
    // stratification parity: per-topic doc counts equal the C52 tags
    val mixByTopic = mix.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val tagByTopic = tags.groupBy(_.getString(1)).view.mapValues(_.size.toLong).toMap
    assert(mixByTopic == tagByTopic)
    // budget: allocations sum to at most half the corpus tokens (floor
    // loss only), each stratum's w_sqrt = floor(sqrt(n_tokens))
    val budget = mix.map(_.getLong(3)).sum / 2
    val alloc = mix.map(_.getLong(5)).sum
    assert(alloc <= budget && alloc > budget - mix.length)
    assert(mix.forall(r => r.getLong(4) == math.sqrt(r.getLong(3).toDouble).toLong))
  }

  test("D16 stream twin emits exactly the batch rows (stateless parity)") {
    val batch = SparkEntry.queries("text_topic_tag")(spark, sf())
      .collect().toSeq
    val stream = SparkEntry.queries("text_topic_tag_stream")(spark, sf())
      .collect().toSeq
    assert(stream == batch)
  }
}
