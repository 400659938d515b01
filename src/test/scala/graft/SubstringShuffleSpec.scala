package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** C37 shuffle-shape contract (r6 verdict #2): the duplicate-gram set
  * must come from a map-side-combinable aggregation, not a window count
  * — MEASURED, not asserted from the plan string. On a corpus with
  * within-partition duplication, the shipped form's shuffle records are
  * bounded by (per-partition distinct digests + per-doc agg partials),
  * while the window form necessarily writes one record per token
  * position. Both forms must also agree row-for-row (refactor witness).
  */
class SubstringShuffleSpec extends SparkSpec {

  // 4 slices x 8 identical 100-token docs per slice, slice vocabularies
  // disjoint: every gram is duplicated (8 copies, all in one partition),
  // so map-side combine collapses each slice's gram stream to its 91
  // distinct digests, while the window exchange must carry all
  // 32 x 91 = 2912 position rows.
  private val docsPerSlice = 8
  private val tokensPerDoc = 100
  private val slices = 4
  private val gramsPerDoc = tokensPerDoc - 10 + 1 // 91
  private val positions = slices * docsPerSlice * gramsPerDoc // 2912
  private val distinctPerSliceSum = slices * gramsPerDoc // 364
  private val nDocs = slices * docsPerSlice

  private def corpus() = {
    import spark.implicits._
    val rows = for {
      s <- 0 until slices
      d <- 0 until docsPerSlice
    } yield ((s * docsPerSlice + d).toLong,
      (0 until tokensPerDoc).map(i => s"v${s}t$i").mkString(" "))
    // exact partition control: slice s's docs land in partition s, no
    // repartition shuffle to pollute the measurement
    spark.sparkContext
      .parallelize(rows.grouped(docsPerSlice).toSeq.map(_.toSeq), slices)
      .flatMap(identity)
      .toDF("doc_id", "text")
  }

  private val records = new java.util.concurrent.atomic.AtomicLong
  private val listener = new org.apache.spark.scheduler.SparkListener {
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      records.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
  }
  private def drainBus(): Unit =
    try {
      val bus = spark.sparkContext.getClass.getMethod("listenerBus")
        .invoke(spark.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: Throwable => Thread.sleep(2000) }
  private def measure(f: => Unit): Long = {
    drainBus(); records.set(0L); f; drainBus(); records.get()
  }

  test("C37 shuffle records: groupBy+broadcast-semi form moves distinct digests, window form moves every position") {
    val d = corpus()
    spark.sparkContext.addSparkListener(listener)
    try {
      val shipped = measure {
        Dedup.substringSpans(d, 10).orderBy(col("doc_id")).collect()
      }
      val windowed = measure {
        Dedup.substringSpansWindowed(d, 10).orderBy(col("doc_id")).collect()
      }
      // shipped: dup-sliver agg partials (<= per-partition distinct sum)
      // + per-doc agg partials (<= docs, combined per partition) + the
      // presentation range exchange (<= docs) + AQE bookkeeping slack
      val bound = distinctPerSliceSum + 2 * nDocs + 64
      assert(shipped <= bound,
        s"shipped form shuffled $shipped records, bound $bound " +
          s"(distinct=$distinctPerSliceSum, docs=$nDocs)")
      // the window exchange carries the full position stream
      assert(windowed >= positions,
        s"window comparator shuffled $windowed, expected >= $positions positions")
      assert(shipped * 4 < windowed,
        s"map-side-combinable form ($shipped) should shuffle far less than the window form ($windowed)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("C37 adaptive sliver: forced co-bucketed shuffle-hash path agrees row-for-row and never broadcasts") {
    val d = corpus()
    // every gram here is duplicated — the sliver IS corpus-scale, the
    // exact regime the r8 verdict flagged; budget 0 forces the path the
    // default budget would pick on a raw crawl
    val prev = spark.conf.getOption(queries.Dedup.SliverBroadcastMaxRowsKey)
    spark.conf.set(queries.Dedup.SliverBroadcastMaxRowsKey, "0")
    try {
      val forced = queries.Dedup.substringSpans(d, 10)
      val plan = forced.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"),
        s"forced path must plan a shuffled hash join, got:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"forced path must not broadcast the sliver, got:\n$plan")
      spark.sparkContext.addSparkListener(listener)
      val (rows, shuffled) = try {
        var r: Array[org.apache.spark.sql.Row] = null
        val n = measure { r = forced.orderBy(col("doc_id")).collect() }
        (r, n)
      } finally spark.sparkContext.removeSparkListener(listener)
      // the probe gram stream now pays its one narrow-record shuffle —
      // the documented cost of the corpus-scale regime (vs. the driver
      // OOM a forced broadcast risks)
      assert(shuffled >= positions,
        s"shuffle-hash path shuffled $shuffled records, expected the $positions-row probe stream")
      val broadcastPath = {
        spark.conf.unset(queries.Dedup.SliverBroadcastMaxRowsKey)
        queries.Dedup.substringSpans(d, 10).orderBy(col("doc_id")).collect()
      }
      assert(rows.toSeq == broadcastPath.toSeq,
        "shuffle-hash and broadcast paths diverged")
    } finally prev match {
      case Some(v) => spark.conf.set(queries.Dedup.SliverBroadcastMaxRowsKey, v)
      case None => spark.conf.unset(queries.Dedup.SliverBroadcastMaxRowsKey)
    }
  }

  test("C37 refactor witness: shipped and window forms agree row-for-row") {
    val d = corpus()
    val a = Dedup.substringSpans(d, 10).orderBy(col("doc_id")).collect()
    val b = Dedup.substringSpansWindowed(d, 10).orderBy(col("doc_id")).collect()
    assert(a.toSeq == b.toSeq, "forms diverged")
    // every gram here is duplicated: full coverage, 10000 bp
    assert(a.length == nDocs)
    assert(a.forall(r => r.getLong(3) == tokensPerDoc.toLong &&
      r.getLong(4) == 10000L))
  }
}
