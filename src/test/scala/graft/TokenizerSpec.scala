package graft

import org.apache.spark.sql.functions._

import graft.queries.Tokenizer

/** Tokenizer-training operators (SURVEY.md §2 C36/C36b/C14b): BPE merge
  * learning pinned on hand-computable corpora, and the Misra-Gries
  * heavy-hitter summary's merge guarantees checked directly (the same
  * theorems inv_heavy_hitters_bounded drives through the driver gate).
  */
class TokenizerSpec extends SparkSpec {

  private def mergeOne(word: String, a: String, b: String): Seq[String] = {
    import spark.implicits._
    Seq(word).toDF("t")
      .select(split(col("t"), "").as("syms"))
      .select(Tokenizer.mergePair(a, b))
      .collect()(0).getSeq[String](0)
  }

  test("mergePair: greedy left-to-right, non-overlapping, trailing pend flushed") {
    assert(mergeOne("aaa", "a", "a") == Seq("aa", "a"))
    assert(mergeOne("aaaa", "a", "a") == Seq("aa", "aa"))
    assert(mergeOne("aab", "a", "b") == Seq("a", "ab"))
    assert(mergeOne("aba", "a", "b") == Seq("ab", "a"))
    assert(mergeOne("baaab", "a", "a") == Seq("b", "aa", "a", "b"))
    assert(mergeOne("bbb", "a", "b") == Seq("b", "b", "b"))
    assert(mergeOne("a", "a", "b") == Seq("a"))
  }

  test("bpeTrain: hand-computed merge sequence, deterministic ties, stops when no pairs remain") {
    // vocab: aaab x3, ab x2, bb x1
    //   iter0 pairs: (a,a)=6 (a,b)=5 (b,b)=1          -> merge (a,a) 6
    //   iter1: aaab=[aa,a,b]: (aa,a)=3 (a,b)=3+2 (b,b)=1 -> merge (a,b) 5
    //   iter2: [aa,ab]x3, [ab]x2: (aa,ab)=3 (b,b)=1      -> merge (aa,ab) 3
    //   iter3: (b,b)=1                                   -> merge (b,b) 1
    //   iter4: no pairs left                             -> stop at 4 merges
    import spark.implicits._
    val wf = Seq(("aaab", 3L), ("ab", 2L), ("bb", 1L)).toDF("t", "freq")
    val merges = Tokenizer.bpeTrainFromVocab(wf, 10)
    assert(merges == Seq(
      (0, "a", "a", 6L), (1, "a", "b", 5L), (2, "aa", "ab", 3L), (3, "b", "b", 1L)))
  }

  test("text_bpe_merges step 0 agrees with the oracle-gated text_bpe_pairs argmax") {
    val dir = sf("sf0.001")
    val pairsTop = SparkEntry.queries("text_bpe_pairs")(spark, dir).collect()(0)
    val merge0 = SparkEntry.queries("text_bpe_merges")(spark, dir)
      .where(col("step") === 0).collect()(0)
    assert(merge0.getString(1) + merge0.getString(2) == pairsTop.getString(0),
      "first learned merge must be the gated pair-count argmax")
    assert(merge0.getLong(3) == pairsTop.getLong(1))
  }

  test("Misra-Gries: no pressure (m >= vocab) reproduces exact counts with d = 0") {
    import spark.implicits._
    val stream = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(2)("z"))
    val summaries = Tokenizer.mgSummaries(
      stream.toDF("w").coalesce(1), m = 16).collect()
    val d = summaries.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    assert(d == 0)
    val est = summaries.filter(!_.isNullAt(0)).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("x" -> 5L, "y" -> 3L, "z" -> 2L))
  }

  test("Misra-Gries under pressure: merged bounds contain exact; exact > D implies candidacy") {
    import spark.implicits._
    // heavy skew + a long singleton tail, tiny m to force decrements
    val stream = (Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 80).map(i => s"tail$i")).toDF("w")
    // multi-partition: merge math must hold across summaries
    val parts = stream.repartition(3)
    val summaries = Tokenizer.mgSummaries(parts, m = 4).collect()
    val dTotal = summaries.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    assert(dTotal > 0, "m=4 over 165 tokens must decrement")
    val lo = summaries.filter(!_.isNullAt(0))
      .groupBy(_.getString(0)).map { case (w, rs) => w -> rs.map(_.getLong(1)).sum }
    val exact = (Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 80).map(i => s"tail$i")).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    lo.foreach { case (w, l) =>
      assert(l <= exact(w), s"$w: lower bound $l exceeds exact ${exact(w)}")
      assert(exact(w) <= l + dTotal, s"$w: exact ${exact(w)} above upper ${l + dTotal}")
    }
    exact.filter(_._2 > dTotal).keys.foreach { w =>
      assert(lo.contains(w), s"guaranteed heavy hitter $w missing from merged candidates")
    }
  }

  test("heavy-hitter shuffle volume is partitions x M, not vocabulary size") {
    import spark.implicits._
    // 8 slices x 25k words over a 50k-word vocabulary: the exact top-k
    // must shuffle at least one record per distinct word even after
    // map-side combine; the MG path's shuffle is bounded by
    // slices x (M+1) summary rows regardless of vocabulary.
    val vocabSize = 50000
    val data = (0 until 200000).map(i => s"w${(i * 2654435761L % vocabSize)}")
    val wdf = spark.sparkContext.parallelize(data, 8).toDF("w")

    val records = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        records.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def drainBus(): Unit =
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(2000) }
    def measure(f: => Unit): Long = {
      drainBus(); records.set(0L); f; drainBus(); records.get()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val m = 1024
      val mgRecords = measure {
        Tokenizer.approxTopKFromWords(wdf, 20, m).collect()
      }
      val exactRecords = measure {
        wdf.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(20).collect()
      }
      // + 8 sentinel rows; small slack for AQE bookkeeping rows
      assert(mgRecords <= 8L * (m + 1) + 64,
        s"MG shuffled $mgRecords records, bound is ${8 * (m + 1)}")
      assert(exactRecords >= vocabSize / 2,
        s"exact path should shuffle ~vocab-size records, saw $exactRecords")
      assert(mgRecords * 4 < exactRecords,
        s"MG ($mgRecords) should shuffle far less than exact ($exactRecords)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("text_vocab_topk_approx: exact top word is the top candidate; gate invariant holds") {
    val dir = sf("sf0.001")
    val approx = SparkEntry.queries("text_vocab_topk_approx")(spark, dir).collect()
    assert(approx.length == 20)
    approx.foreach(r => assert(r.getLong(1) <= r.getLong(2)))
    val exactTop = SparkEntry.queries("text_vocab_topk")(spark, dir).collect()(0).getString(0)
    assert(approx.map(_.getString(0)).contains(exactTop),
      "the exact argmax word must be among the approx candidates")
    val viol = SparkEntry.queries("inv_heavy_hitters_bounded")(spark, dir)
    assert(viol.count() == 0)
  }
}
