package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Physical-plan assertions — the 100 TB contract from SURVEY.md §5:
  * filters/projections reach the parquet scan, small dimensions
  * broadcast, limits use TopK, aggregates partial-aggregate map-side,
  * and view list() ranges push binary bounds into the scan. These are
  * the properties that decide whether a plan survives a 1000-executor
  * scale-up, independent of row counts.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String, dir: String = sf()): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def planStr(name: String): String = planOf(name).toString

  test("q02: filter AND projection push into the parquet scan") {
    val p = planStr("q02_filter_project")
    assert(p.contains("PushedFilters:") &&
      (p.contains("GreaterThan(l_discount") || p.contains("GreaterThanOrEqual(l_shipdate")),
      s"no pushed filters in:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q03: dimension joins broadcast (no shuffled fact-dim join)") {
    val p = planStr("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q04: star join is all-broadcast — the fact table never shuffles for the join") {
    val p = planStr("q04_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join in star join:\n$p")
  }

  test("q01: aggregation is partial (map-side combine before the exchange)") {
    val p = planStr("q01_agg")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial")) || aggLines.size >= 2,
      s"no partial aggregation:\n$p")
  }

  test("q10: ORDER BY + LIMIT runs as TopK, not a global sort") {
    val p = planStr("q10_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"expected TopK:\n$p")
  }

  test("ann_bruteforce: query set broadcasts; corpus is never shuffled for scoring") {
    val p = planStr("ann_bruteforce")
    // scoring must be scan -> broadcast nested loop -> project; a
    // shuffle-based join over the corpus is the 100 TB failure mode
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast cross join of the query set:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus must not shuffle (or pair-space join) for scoring:\n$p")
  }

  test("ann_lsh: every broadcast hint wraps the FILTERED query set, never the corpus") {
    // at 100 TB a corpus-side broadcast() hint is fatal regardless of what
    // the local-scale planner would have chosen on its own — assert on the
    // analyzed plan that each ResolvedHint subtree carries the vec_id < NQ
    // query filter
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val lp = SparkEntry.queries("ann_lsh")(spark, sf()).queryExecution.analyzed
    val hints = lp.collect { case h: ResolvedHint => h }
    assert(hints.nonEmpty, "expected broadcast hints on the query side")
    val queryFilter = "vec_id#\\d+L? < (cast\\(10 as bigint\\)|10)([^0-9]|$)".r
    hints.foreach { h =>
      val sub = h.child.toString
      // word-boundary match: a bare "< 10" substring would also accept a
      // corpus-wide "< 100000" sampling filter
      assert(queryFilter.findFirstIn(sub).isDefined,
        s"broadcast hint wraps an unfiltered (corpus-wide) subtree:\n$sub")
    }
  }

  test("text_top_terms: the vocabulary (document-frequency) table is NOT hint-broadcast") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val lp = SparkEntry.queries("text_top_terms")(spark, sf()).queryExecution.analyzed
    assert(lp.collect { case h: ResolvedHint => h }.isEmpty,
      "web-scale vocabularies exceed broadcast limits — join on word must shuffle")
  }

  test("q28 range join: bucketized equi-join, no nested-loop over the pair space") {
    val p = planStr("q28_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to a pair-space plan:\n$p")
    assert(p.contains("Join"), s"expected an equi-join on (user_id, bin):\n$p")
  }

  test("bucketed tables co-locate their join: no exchange on either side") {
    // the 100 TB pattern for repeated fact-fact joins: bucket both sides
    // on the join key at write time, and the join reads bucket-aligned
    // files with NO shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.read.parquet(s"${sf()}/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      spark.read.parquet(s"${sf()}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join: hot keys spread across (key, salt) reducers; result == plain join") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // pathological skew: 90% of facts share one key
      val facts = (0 until 5000).map(i =>
        (if (i % 10 == 0) i.toLong % 50 else 7L, s"payload$i")).toDF("k", "v")
      val dims = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "d")
      val salted = graft.functions.Salted.join(facts, dims, "k", salts = 8)
      val plain = facts.join(dims, "k")
      assert(salted.count() == plain.count())
      assert(salted.select("k", "v", "d").except(plain.select("k", "v", "d")).isEmpty)
      val p = salted.queryExecution.executedPlan.toString
      assert(p.contains("_salt"), s"join must shuffle on (k, _salt):\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("view list(): binary kb range bounds push into the state parquet scan") {
    val df = SparkEntry.queries("view_list_range")(spark, sf())
    val p = df.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(l => l.contains("PushedFilters") && l.contains("kb"))
    assert(scanLine.isDefined &&
      (scanLine.get.contains("GreaterThanOrEqual(kb") || scanLine.get.contains("LessThan(kb")),
      s"kb range not pushed to scan:\n$p")
    // r12: a bounded limit resolves its winning keys driver-side and
    // pushes them as In(kb) — the final read is ONE scan, no join
    assert(scanLine.get.contains("In(kb"), s"limit keys not In-pushed:\n$p")
    assert(!p.contains("Join"), s"bounded-limit list must be join-free:\n$p")
  }

  test("q22 as-of join: one shuffle on user_id, no pair-space join") {
    val p = planStr("q22_asof_join")
    // the union-merge trick must not plan any join at all
    assert(!p.contains("Join"), s"as-of should be join-free:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    // one hashpartitioning(user_id) for the window + one range for ORDER BY
    assert(exchanges <= 2, s"too many shuffles ($exchanges):\n$p")
  }

  test("text suite: single-pass scans, no shuffle except presentation sort") {
    val p = planStr("text_quality")
    // one rangepartitioning exchange for the final ORDER BY is allowed
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2,
      s"text_quality shuffles more than the presentation sort:\n$p")
  }

  test("text_repetition: per-row kernel — no exchange except the presentation sort") {
    // the relational form of this statistic (explode grams -> groupBy)
    // shuffles the corpus; the kernel form must not
    val p = planStr("text_repetition")
    assert(p.linesIterator.count(_.contains("Exchange")) <= 1,
      s"repetition statistic shuffles beyond the ORDER BY:\n$p")
  }

  test("text_lang_rebalance: the computed rate table joins by broadcast, corpus never shuffles for it") {
    val p = planStr("text_lang_rebalance")
    assert(p.contains("BroadcastHashJoin"), s"rate table should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the |langs|-row rate join must not shuffle the corpus:\n$p")
  }

  test("text_pack_sequences: one shuffle into shards, greedy scan stays in-partition") {
    // groupByKey(shard) is the only data exchange; the presentation sort
    // on the per-shard aggregate rows is the second allowed exchange
    val p = planStr("text_pack_sequences")
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2,
      s"packing should shuffle once into shards (+ presentation sort):\n$p")
  }

  test("text_contamination: the probe gram set broadcasts; corpus grams never sort-merge") {
    val p = planStr("text_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"probe set should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side gram stream must not shuffle for the probe join:\n$p")
  }

  test("text_decontaminate_spans: probe broadcasts, no window count, training grams never sort-merge") {
    val p = planStr("text_decontaminate_spans")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded probe gram set must broadcast (C21's stance):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the training-side gram stream must not shuffle for the probe join:\n$p")
    assert(!p.contains("Window"),
      s"coverage must fold via the map-side-combinable groupBy, not a window:\n$p")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial")) || aggLines.size >= 2,
      s"per-doc coverage must partial-aggregate before its shuffle:\n$p")
  }

  test("text_mixture_schedule: one partial-agg pass; schedule totals broadcast back") {
    val p = planStr("text_mixture_schedule")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial")) || aggLines.size >= 2,
      s"stratum token counting must map-side combine:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the 1-row totals join must broadcast, never shuffle the schedule:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_chars") && !readSchema.contains("doc_id"),
      s"scan should read only (source, lang, text): $readSchema")
  }

  test("integer-trained predict paths are map-only: no join, no shuffle " +
      "except the presentation sort") {
    // C31d/C47b: training aggregates in a separate bounded job; the
    // RETURNED frame must be a pure projection with the det literals
    // riding along — the 100 TB predict shape
    Seq("text_quality_regressor_int", "text_langid_router_int").foreach { q =>
      val p = planStr(q)
      assert(!p.contains("Join"), s"$q predict must not join:\n$p")
      assert(p.linesIterator.count(_.contains("Exchange")) <= 1,
        s"$q predict shuffles beyond the presentation sort:\n$p")
    }
  }

  test("dedup_semantic_int: pairs mine through the cell equi-join, never a cross join") {
    val p = planStr("dedup_semantic_int")
    // SemDeDup's whole point is that candidates are quadratic in CELL
    // size only — the pair self-join must key on cluster, not cartesian
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"within-cell pair mining degraded to an all-pairs join:\n$p")
  }

  test("ann_filtered: label predicate joins by broadcast hash probe; corpus never shuffles or cross-joins") {
    val p = planStr("ann_filtered")
    // filter-before-distance: the label equi-join must be a (broadcast)
    // HASH join — the predicate rejects rows before the d-dim dot product
    // — not the unfiltered family's nested-loop cross join
    assert(p.contains("BroadcastHashJoin"),
      s"expected a broadcast HASH join on label:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"filtered search must not degrade to the unfiltered cross join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must never shuffle for the query join:\n$p")
  }

  test("ann_filtered_ivf: probe joins the labeled index by broadcast hash; corpus never sort-merges") {
    val p = planStr("ann_filtered_ivf")
    assert(p.contains("BroadcastHashJoin"),
      s"the (cell, label) probe must be a broadcast hash join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"the assigned corpus must only be hash-probed, never shuffled or cross-joined:\n$p")
  }

  test("text_mixture_apply: the schedule joins back by broadcast; apply pass partial-aggregates") {
    val p = planStr("text_mixture_apply")
    assert(p.contains("BroadcastHashJoin"),
      s"the |strata|-row schedule must broadcast into the apply pass:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must never shuffle for the schedule join:\n$p")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial")) || aggLines.size >= 2,
      s"realized-sample accounting must map-side combine:\n$p")
  }

  test("text_ngram_counts: partial agg before the gram shuffle; count filter after partial agg") {
    val p = planStr("text_ngram_counts")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial")) || aggLines.size >= 2,
      s"gram counting must map-side combine (one row per distinct gram " +
        s"per partition crosses the wire, not one per occurrence):\n$p")
    // groupBy(gram) + presentation ORDER BY(gram) — nothing else may shuffle
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2,
      s"unexpected extra shuffle in LM counting:\n$p")
  }

  test("text_tfidf: the open-vocabulary df join carries no broadcast hint") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val lp = SparkEntry.queries("text_tfidf")(spark, sf()).queryExecution.analyzed
    assert(lp.collect { case h: ResolvedHint => h }.isEmpty,
      "a hinted df-table broadcast would be forced at ANY scale — a 100 TB " +
        "vocabulary exceeds driver memory; let size stats decide per scale")
  }

  test("text_lm_score: ONE corpus scan (bgc exchange reused), count-table joins un-hinted") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    // the bigram tokenize+explode must run once: the per-doc bigram
    // count `bgc` is the single corpus-scale aggregation and both its
    // consumers (count tables, scoring probe) sit above its exchange,
    // which ReuseExchange collapses — a second documents scan in this
    // plan means the derivation regressed to re-tokenizing the corpus
    val df = SparkEntry.queries("text_lm_score")(spark, sf())
    // AQE dedups exchanges at STAGE MATERIALIZATION time — the initial
    // adaptive plan prints every subtree; only the final plan shows
    // which stages were reused. Execute, then read the final plan.
    df.collect()
    // the adaptive plan string appends the pre-execution "Initial Plan"
    // section, which re-prints every un-reused subtree — assert on the
    // FINAL section only
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents")) == 1,
      s"bigram source must scan documents exactly once:\n$p")
    // bgc's exchange feeds the count tables AND the scoring probe; c2's
    // exchange feeds the join side AND cp — both dedups must fire
    assert(p.linesIterator.count(_.contains("ReusedExchange")) >= 2,
      s"bgc/c2 exchange reuse did not fire — a consumer re-derives the corpus:\n$p")
    // open-vocabulary c2/cp joins: no forced broadcast at ANY scale (a
    // 100 TB vocabulary outgrows any driver); size stats decide
    assert(df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.isEmpty,
      "count-table joins must stay un-hinted — stats decide per scale")
  }

  test("text_lm_kn: ONE corpus scan, bgc/c2 reuse fires, only the 1-row ntypes broadcast is hinted") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    // same derivation contract as text_lm_score: the KN extras (cp+n1f,
    // n1r, ntypes) are all groupBys over the c2 TYPE table, so they must
    // ride the same bgc exchange — a second documents scan means a
    // consumer re-tokenized the corpus
    val df = SparkEntry.queries("text_lm_kn")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents")) == 1,
      s"bigram source must scan documents exactly once:\n$p")
    assert(p.linesIterator.count(_.contains("ReusedExchange")) >= 2,
      s"bgc/c2 exchange reuse did not fire — a consumer re-derives the corpus:\n$p")
    // exactly ONE hint: the 1-row ntypes aggregate (always broadcastable);
    // the open-vocabulary c2/cp/n1r joins stay un-hinted — stats decide
    assert(df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size == 1,
      "only the 1-row ntypes broadcast may be hinted")
  }

  test("pipeline_curate_lm: two documents scans (lm stage + curate stage), bgc/c2 reuse still fires") {
    // the composed pipeline may touch the corpus once per stage — the
    // lm model derivation and the curate feature pass — but no more:
    // a third scan means the lm subtree's exchange reuse regressed
    // inside the composition
    val df = SparkEntry.queries("pipeline_curate_lm")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents")) == 2,
      s"lm stage + curate stage = exactly two documents scans:\n$p")
    assert(p.linesIterator.count(_.contains("ReusedExchange")) >= 2,
      s"bgc/c2 exchange reuse must survive the composition:\n$p")
  }

  test("text_pii_redact: pure per-row scan — no shuffle except the presentation sort") {
    val p = planStr("text_pii_redact")
    assert(p.linesIterator.count(_.contains("Exchange")) <= 1,
      s"redaction is per-row column work and must not shuffle:\n$p")
  }

  test("text_sample_weighted: deterministic coin filters BEFORE the aggregation shuffle") {
    val p = planStr("text_sample_weighted")
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2,
      s"weighted sampling is filter + partial agg; extra shuffles:\n$p")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial")) || aggLines.size >= 2,
      s"per-source totals must map-side combine:\n$p")
  }

  test("q29_salted_join: joins on (key, _salt), dim side replicated, result matches plain join") {
    val df = SparkEntry.queries("q29_salted_join")(spark, sf())
    // (a) the join keys the shuffle on BOTH the natural key and the salt
    val joinLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("Join")).getOrElse("")
    assert(joinLine.contains("o_custkey") && joinLine.contains("_salt"),
      s"join must key on (o_custkey, _salt): $joinLine")
    // (b) the dim side is replicated x salts before the join
    val lp = df.queryExecution.optimizedPlan.toString
    assert(lp.contains("explode") || lp.contains("Generate"),
      s"dim side must explode over the salt range:\n$lp")
    // (c) result matches the plain (unsalted) join the oracle runs.
    // Counts compare exactly; the double sums accumulate in different
    // partition orders (per (key,salt) vs per key), so the last-ulp
    // noise can round to a different cent — compare within 0.011, not
    // with exact Set equality (a data-dependent flake otherwise)
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
    val c = spark.read.parquet(s"${sf()}/customer.parquet")
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
    def bySeg(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (saltedM, plainM) = (bySeg(df.collect()), bySeg(plain.collect()))
    assert(saltedM.keySet == plainM.keySet, "segment sets diverged")
    saltedM.foreach { case (seg, (n, total)) =>
      assert(n == plainM(seg)._1, s"count diverged for $seg")
      assert(math.abs(total - plainM(seg)._2) <= 0.011,
        s"sum diverged for $seg: $total vs ${plainM(seg)._2}")
    }
  }

  test("dedup_substring_spans: dup sliver broadcasts back, no window count, probe side never shuffles") {
    // the r6 verdict's wrong-shape shuffle: a count(*) over (partition
    // by h) window moved one row per corpus token position. The shipped
    // plan must carry the duplicate set through a partial-aggregated
    // groupBy and a BROADCAST semi join — any Window operator or
    // shuffled join here is the regression coming back
    // (SubstringShuffleSpec measures the record counts).
    val p = planOf("dedup_substring_spans", sf("sf0.01")).toString
    assert(!p.contains("Window"), s"window count crept back into C37:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"dup-sliver join-back must broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast semi join:\n$p")
  }

  test("dedup_incremental_bloom: the corpus side never shuffles — bloom probe + broadcast joins") {
    // the plan promise of the bloom form: corpus digests stream through a
    // broadcast semi-join probe (and the survivors' anti-join broadcasts
    // the found-digest sliver) — a SortMergeJoin anywhere means a corpus
    // exchange crept back in, which is what the plain C30 form is for
    // (the indexed form's per-bucket probe runs behind a localCheckpoint
    // during construction, so it is not visible in the LAZY plan — its
    // one-deserialization-per-touched-bucket behavior is pinned in
    // DedupAnnSpec's scan-count spec instead).
    // Asserted on incrementalExactBloomIndexedPlan, the pre-checkpoint
    // plan builder: the shipped operator eagerly checkpoints its result
    // (so per-increment pins release), which collapses the final plan
    // to a scan — the join structure only exists here.
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val corpus = d.where("doc_id % 3 != 0")
    val batch = d.where("doc_id % 3 = 0")
    val idx = graft.queries.Dedup
      .corpusBloomIndex(corpus, nBuckets = 64).localCheckpoint(true)
    try {
      val (lazyOut, pinned) = graft.queries.Dedup
        .incrementalExactBloomIndexedPlan(batch, corpus, idx)
      val p = lazyOut.queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"corpus side must join only by broadcast:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
      pinned.foreach(_.unpersist())
    } finally idx.unpersist()
  }

  test("dedup_incremental_minhash: the probe join broadcasts the BATCH band keys, never the corpus index") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    // assert on the probe subplan directly — the C33 query materializes
    // its stages (localCheckpoint), which detaches this join from the
    // final query's analyzed plan
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val corpusB = graft.queries.Dedup.bandedMinhashKeys(d.where("doc_id % 3 != 0"))
      .select(col("doc_id").as("c_id"), col("bk"))
    val batchB = graft.queries.Dedup.bandedMinhashKeys(d.where("doc_id % 3 = 0"))
    val lp = graft.queries.Dedup.crossBandCands(corpusB, batchB)
      .queryExecution.analyzed
    val hints = lp.collect { case h: ResolvedHint => h }
    assert(hints.nonEmpty, "expected a broadcast hint on the batch band keys")
    hints.foreach { h =>
      val sub = h.child.toString
      // the batch filter is doc_id % 3 = 0; the corpus side carries the
      // negated form — a hint wrapping the corpus subtree would
      // broadcast the 100 TB signature index
      // the corpus subtree is recognizable by its c_id alias and its
      // negated batch filter ("NOT (...)"); neither may appear under a
      // broadcast hint
      assert(sub.contains("(doc_id#") &&
        (sub.contains("= cast(0 as bigint)") || sub.contains("= 0")) &&
        !sub.contains("AS c_id") && !sub.contains("NOT ("),
        s"broadcast hint wraps a corpus-side subtree:\n$sub")
    }
  }

  test("text_quality_classifier: one kernel pass, no shuffle except the presentation sort") {
    val p = planStr("text_quality_classifier")
    assert(p.linesIterator.count(_.contains("Exchange")) <= 1,
      s"classification is per-row column work and must not shuffle:\n$p")
    assert(!p.contains("Join"), s"hashing-trick scoring must not join a vocabulary:\n$p")
  }

  test("tokenWeightStats: empty tokens and empty docs score [0, 0]-consistently") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("ab", "", "ab")), // empty token skipped, dup token counted twice
      (2L, Seq.empty[String]),
      (3L, Seq(""))).toDF("id", "ws")
    val got = df.select(col("id"),
        graft.functions.Kernels.tokenWeightStats(col("ws")).as("st"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(2) == Seq(0L, 0L) && got(3) == Seq(0L, 0L))
    assert(got(1)(0) == 2L && got(1)(1) % 2 == 0, "dup token must count twice")
  }

  test("text_search_topk: the probe set broadcasts — the corpus never re-shuffles for the query batch") {
    val p = planStr("text_search_topk")
    assert(p.contains("BroadcastHashJoin"),
      s"probe retrieval must broadcast the bounded probe set:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join here would shuffle the whole tf table per probe batch:\n$p")
    // df derives FROM tf (count(tf) anchors it), so the index build
    // tokenizes the corpus exactly once (r7: was twice — the df path
    // collapsed into a raw-stream distinct and lost the shared
    // exchange). Reuse fires at AQE stage materialization — execute,
    // then read the FINAL plan.
    val df = SparkEntry.queries("text_search_topk")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(fin.linesIterator.count(_.contains("Generate explode")) == 1,
      s"tf + df must share ONE tokenize pass:\n$fin")
  }

  test("emb_label_stats: the (label, dim) sum table broadcasts back — no corpus-size sort-merge join") {
    val p = planStr("emb_label_stats")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"dot pass must broadcast the tiny centroid-sum table:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no join in this plan may sort-merge (both join inputs bound by k x dim):\n$p")
  }

  test("tokenWeightStats hashes CODE POINTS — non-BMP tokens follow the oracle's convention") {
    import spark.implicits._
    // "a😀b": code points (97, 128512, 98) at positions 1..3 — the old
    // charAt loop saw FOUR UTF-16 units (surrogate pair split) and
    // diverged from DuckDB's ascii(string_split(tok, '')) iteration
    val df = Seq(Seq("a😀b")).toDF("ws")
    val st = df.select(graft.functions.Kernels.tokenWeightStats(col("ws")).as("st"))
      .head().getSeq[Long](0)
    var h = 0L
    Seq(97L, 128512L, 98L).zipWithIndex.foreach { case (cp, i) =>
      h += cp * (1L + (131L * (i + 1)) % 997L)
    }
    val expected = (h % 1048576L) * 2654435761L % 2003L - 1001L
    assert(st == Seq(1L, expected),
      s"kernel must hash per code point with code-point positions, got $st")
  }

  test("BloomMightContainLong equality is by filter CONTENT, not array identity") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.util.sketch.BloomFilter
    def bytesOf(seed: Long): Array[Byte] = {
      val bf = BloomFilter.create(100L, 0.03)
      bf.putLong(seed)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    val e1 = graft.functions.BloomMightContainLong(Literal(1L), bytesOf(42L))
    val e2 = graft.functions.BloomMightContainLong(Literal(1L), bytesOf(42L))
    val e3 = graft.functions.BloomMightContainLong(Literal(1L), bytesOf(43L))
    assert(!(e1.bytes eq e2.bytes), "test must exercise distinct arrays")
    assert(e1 == e2 && e1.hashCode == e2.hashCode,
      "identical probes must compare equal for canonicalization/CSE")
    assert(e1.semanticEquals(e2))
    assert(e1 != e3, "different filters must not compare equal")
  }

  test("text_bpe_pairs: both aggs partial, top-k is TakeOrdered, scan reads text only") {
    val p = planStr("text_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), s"expected TopK, not global sort:\n$p")
    assert(p.linesIterator.count(_.contains("partial_")) >= 2,
      s"expected map-side combine on BOTH the vocab and pair aggs:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text") && !readSchema.contains("doc_id"),
      s"scan should read only the text column: $readSchema")
  }

  test("text_vocab_topk_approx: D broadcasts; no exchange ever carries the raw word stream") {
    val p = planStr("text_vocab_topk_approx")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row D aggregate should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"expected TopK, not global sort:\n$p")
    // every Exchange input is downstream of the checkpointed summary
    // table (Scan ExistingRDD), never the exploded corpus words — the
    // quantitative form of this claim is the shuffle-records bound in
    // TokenizerSpec
    assert(!p.contains("Scan parquet"),
      s"corpus scan must be behind the localCheckpoint, not re-read per branch:\n$p")
  }

  test("emb_quantize: pure per-row folds — no exchange except the presentation sort") {
    val p = planStr("emb_quantize")
    assert(p.linesIterator.count(_.contains("Exchange")) <= 1,
      s"quantization must not shuffle before the ORDER BY:\n$p")
    assert(!p.contains("Generate"), s"no explode belongs in the per-row fold path:\n$p")
  }

  test("emb_covariance: moment agg partial-aggregates; dim-sum tables broadcast back") {
    val p = planStr("emb_covariance")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial")),
      s"the n·d² term stream must partial-aggregate map-side:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the d-row sum tables must broadcast, not shuffle the 2080-row moment table:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join belongs here:\n$p")
  }

  test("media_phash_dedup: one hash-partition exchange of slim rows, payload never shuffles") {
    val p = planStr("media_phash_dedup")
    // window on phash + presentation sort — nothing else; and the rows
    // entering the window exchange are (media_id, phash), not payloads
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2,
      s"expected only the window + sort exchanges:\n$p")
    assert(!p.contains("payload"),
      s"the binary payload column must be pruned before any exchange:\n$p")
  }

  test("text_cooccurrence_pmi: map-side pair build, un-hinted vocab joins, TopK") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, ResolvedHint}
    val qe = SparkEntry.queries("text_cooccurrence_pmi")(spark, sf()).queryExecution
    // the only broadcast hint wraps the 1-row grand-total aggregate —
    // never a vocabulary table (text_tfidf stance: a 100 TB vocabulary
    // outgrows any driver broadcast)
    val hints = qe.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.size == 1, s"expected exactly the 1-row total hint, got ${hints.size}")
    val hinted = hints.head.child.collect {
      case a: Aggregate if a.groupingExpressions.isEmpty => a
    }
    assert(hinted.nonEmpty, s"the hint must wrap the ungrouped total:\n${hints.head.child}")
    // unigrams ride the pair item stream as null-partner rows and every
    // table derives from ONE eagerly-checkpointed (wa, wb) aggregate —
    // the final plan must read the checkpoint, never the corpus (the
    // dedup_clusters mining-once pin: differing consumer filters push
    // below the aggregate and would otherwise re-tokenize per consumer)
    val p = qe.executedPlan.toString
    assert(!p.contains("Scan parquet"),
      s"corpus scan must be behind the localCheckpoint, not re-read per consumer:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must be TopK, not a global sort:\n$p")
  }

  test("text_shard_manifest: corpus window is bucket-partitioned; only the 256-row offset cumsum is single-partition") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = SparkEntry.queries("text_shard_manifest")(spark, sf()).queryExecution.optimizedPlan
    val wins = lp.collect { case w: LWindow => w }
    assert(wins.size == 2, s"expected the bucket cumsum + the offset cumsum:\n$lp")
    val (unpart, part) = wins.partition(_.partitionSpec.isEmpty)
    assert(part.size == 1 && unpart.size == 1,
      s"exactly one window may be unpartitioned (the bounded offset table):\n$lp")
    // the single-partition window must sit ABOVE the bucket aggregate —
    // its input is |buckets| slim rows, never the corpus
    assert(unpart.head.child.collect {
      case a: Aggregate if a.groupingExpressions.nonEmpty => a
    }.nonEmpty, s"the unpartitioned cumsum must consume the bucket aggregate:\n$lp")
    val p = SparkEntry.queries("text_shard_manifest")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast back, not shuffle the corpus:\n$p")
  }

  test("text_lm_trigram: ZERO corpus scans in the probe plan — count tables behind checkpoints") {
    // the per-doc trigram count is THE corpus-scale aggregation and it
    // (plus every marginalized count table) is an eager checkpoint
    // (r13 OPT): the ONE corpus scan happens inside tgc's
    // materialization job, so the executed probe plan must contain NO
    // documents scan at all — one would mean a consumer re-tokenized
    // the corpus (the C38b RemoveRedundantAggregates / inferred-filter
    // failure class, which the pre-r13 pin caught as a SECOND scan).
    // The count tables read back as ExistingRDD checkpoint scans.
    val df = SparkEntry.queries("text_lm_trigram")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents")) == 0,
      s"trigram probe plan must not re-scan documents:\n$p")
    assert(p.linesIterator.count(_.contains("Scan ExistingRDD")) >= 5,
      s"checkpointed count tables missing from the probe plan:\n$p")
  }

  test("text_lm_backoff: ZERO corpus scans in the probe plan — count tables behind checkpoints") {
    // the per-doc 4-gram count is THE corpus-scale aggregation; it and
    // every lower-order table marginalized from it (the C38d identity)
    // are eager checkpoints (r13 OPT) — the ONE corpus scan happens
    // inside fgc's materialization job, so a documents scan in the
    // executed probe plan means a lower-order model table re-tokenized
    // the corpus instead of marginalizing the 4-gram type table.
    val df = SparkEntry.queries("text_lm_backoff")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents")) == 0,
      s"backoff probe plan must not re-scan documents:\n$p")
    assert(p.linesIterator.count(_.contains("Scan ExistingRDD")) >= 7,
      s"checkpointed count tables missing from the probe plan:\n$p")
  }

  test("text_importance_resample: one corpus scan, broadcast model, partial agg") {
    // fbc (per-doc bucket counts) is the one corpus-scale aggregation;
    // both models fold out of a single conditional aggregate ABOVE its
    // exchange (a where(isTgt) subtree would push the doc_id predicate
    // into a second documents scan), the B-row model broadcasts into
    // the probe, and the bucket hash runs inside codegen — no gram
    // strings and no vocabulary table anywhere in the plan
    val df = SparkEntry.queries("text_importance_resample")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents")) == 1,
      s"resample must scan documents exactly once:\n$p")
    assert(p.linesIterator.count(_.contains("ReusedExchange")) >= 1,
      s"model must reuse fbc's exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the B-bounded model must broadcast into the probe:\n$p")
    assert(p.linesIterator.filter(_.contains("HashAggregate"))
      .exists(_.contains("partial")),
      s"bucket counts must partial-aggregate map-side:\n$p")
  }

  test("text_remove_boilerplate: detection is slim-digest partial agg; rewrite joins all broadcast") {
    val p = planStr("text_remove_boilerplate")
    // dup sliver + affected-id set + flag join all broadcast — the
    // text-carrying pass must stay map-side narrow for unaffected docs
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast semi/flag joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-side shuffle join belongs in the rewrite:\n$p")
    assert(p.linesIterator.filter(_.contains("HashAggregate"))
      .exists(_.contains("partial")),
      s"chunk-frequency counts must partial-aggregate map-side:\n$p")
  }

  test("pipeline_curate_shard: the composition keeps C45's window contract") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = SparkEntry.queries("pipeline_curate_shard")(spark, sf()).queryExecution.optimizedPlan
    val wins = lp.collect { case w: LWindow => w }
    // dedup rn window (digest-partitioned, one LOGICAL copy per consumer
    // branch — physical ReuseExchange dedups it) + bucket cumsum
    // (partitioned) + offset cumsum (unpartitioned, bounded)
    val (unpart, part) = wins.partition(_.partitionSpec.isEmpty)
    assert(part.size >= 2 && unpart.size == 1,
      s"only the bounded offset cumsum may be single-partition:\n$lp")
    assert(unpart.head.child.collect {
      case a: Aggregate if a.groupingExpressions.nonEmpty => a
    }.nonEmpty, s"the unpartitioned cumsum must consume the bucket aggregate:\n$lp")
  }

  test("text_domain_filter: blocklist anti-joins by broadcast; domain count partial-aggregates; no corpus-wide window") {
    val p = planStr("text_domain_filter")
    assert(p.contains("BroadcastHashJoin"), s"blocklist must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"blocklist/sliver joins must not sort-merge the corpus:\n$p")
    // the per-domain count runs inside the adaptiveBuild checkpoint job
    // (not visible in the final plan) — assert its partiality on the
    // standalone count subplan the query builds it from
    val cnt = graft.core.Tables(spark, sf(), "documents")
      .groupBy(graft.queries.Text.domainCol.as("domain"))
      .agg(count(lit(1)).as("n")).where(col("n") > 8)
      .queryExecution.executedPlan.toString
    val aggLines = cnt.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial")) || aggLines.size >= 2,
      s"per-domain count must partial-aggregate:\n$cnt")
    // the ranking window exists, but ONLY on the over-cap semi-joined
    // branch — the under-cap branch (the crawl's long tail) has none
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Union}
    val lp = SparkEntry.queries("text_domain_filter")(spark, sf()).queryExecution.optimizedPlan
    val union = lp.collect { case u: Union => u }
    assert(union.nonEmpty, s"expected under-cap ∪ capped union:\n$lp")
    val children = union.head.children
    val windowed = children.count(_.collect { case w: LWindow => w }.nonEmpty)
    assert(windowed == 1,
      s"exactly one union branch (the over-cap sliver) may carry the window, got $windowed:\n$lp")
  }

  test("media_ann: 10-query embed set broadcasts; pair corpus never shuffles for scoring") {
    val p = planStr("media_ann")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast cross join of the query embeds:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"pair corpus must not shuffle for scoring:\n$p")
  }

  test("ann_ivf_int: probe set broadcasts into the cell equi-join; corpus never sort-merges") {
    val p = planStr("ann_ivf_int")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the (probe cells × queries) side broadcast into the cell join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the integer IVF must equi-join on cell, never pair-score the corpus:\n$p")
  }

  test("ann_lsh_int: query signature set broadcasts; corpus signature pass never pair-scores") {
    val p = planStr("ann_lsh_int")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the query (table, sig) set broadcast into the bucket join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the bucket equi-join, never an all-pairs scan:\n$p")
  }

  // (no ann_pq_int pin: its result detaches through an eager
  // localCheckpoint — the returned plan is a cached-block scan, the
  // documented Pinned-checkpoint plan-assert limitation)

  test("pipeline_rag_probe: query set broadcasts into the cell equi-join; no all-pairs scan") {
    val p = planStr("pipeline_rag_probe")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the 10-query probe set broadcast into the cluster join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the cell equi-join, never an all-pairs scan:\n$p")
  }

  test("q33_funnel: all three stages are equi-joins on user_id; no nested-loop step") {
    val p = planStr("q33_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the sequenced min-aggregations must chain through equi-joins:\n$p")
  }

  test("dedup_minhash_int: candidates meet in the band-bucket equi-join only") {
    val p = planStr("dedup_minhash_int")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banding exists to avoid the all-pairs scan:\n$p")
  }

  test("text_fim_transform: a pure projection — no exchange except the presentation sort") {
    val p = planStr("text_fim_transform")
    assert(p.linesIterator.count(_.contains("Exchange")) <= 1,
      s"FIM is per-row arithmetic; nothing should shuffle before the sort:\n$p")
  }

  test("media_text_pair_dedup: one signature-window shuffle + presentation sort only") {
    // the conjunction key is 40 B of (hash, digest) — the payload and
    // caption must never reach an exchange
    val p = planStr("media_text_pair_dedup")
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2,
      s"pair dedup should shuffle once on signatures (+ ORDER BY):\n$p")
  }

  test("media_text_pair_incremental: the corpus signature index joins as a real anti join") {
    val p = planStr("media_text_pair_incremental")
    assert(p.contains("LeftAnti"), s"expected an anti join on signatures:\n$p")
    assert(!p.contains("CartesianProduct"), s"no pair-space join:\n$p")
  }

  test("pipeline_pretrain_compact: the staged fold is join-keyed end to end — no cartesian") {
    // the e2e compaction composes two miners, two CCs and the
    // coverage/mixture/shard tail: the 100 TB failure mode is any one
    // of those stages degenerating into a pair-space cartesian (the
    // only sanctioned unkeyed join is mixtureAlloc's 1-row scalar
    // broadcast, which plans as BroadcastNestedLoopJoin, not
    // CartesianProduct)
    val p = planStr("pipeline_pretrain_compact")
    assert(!p.contains("CartesianProduct"), s"pair-space join in:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast probe/schedule joins:\n$p")
  }

  test("gramsMultiN keeps multiplicity where gramsN dedups") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", "b", "a", "b", "c"))).toDF("ws")
    val multi = df.select(graft.functions.Kernels.gramsMultiN(col("ws"), 2)).head.getSeq[String](0)
    val dist = df.select(graft.functions.Kernels.gramsN(col("ws"), 2)).head.getSeq[String](0)
    assert(multi == Seq("a b", "b a", "a b", "b c"))
    assert(dist == Seq("a b", "b a", "b c"))
  }
}
