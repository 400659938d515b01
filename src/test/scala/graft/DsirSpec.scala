package graft

import graft.SparkEntry

/** C46 `text_importance_resample` — DSIR-style hashed-ngram importance
  * resampling. Three witnesses:
  *
  *  1. DENSE REPLICA: a plain-Scala reimplementation of the whole
  *     bucket→model→ratio→coin path (BigInt wide products, truncating
  *     division) must agree row-for-row on a small corpus — the
  *     ClassifierTrainSpec discipline: an independent witness computed
  *     without Spark, DuckDB, or any shared expression code.
  *  2. SEMANTICS: a document sharing the target split's bigrams must
  *     out-weigh a document made of bigrams the target never saw —
  *     the entire point of importance resampling.
  *  3. REAL DATA: every >=2-token document scores, weights are
  *     non-negative, and keep is exactly the coin rule.
  */
class DsirSpec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/dsir-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- plain-Scala replica ------------------------------------------

  private def coin(id: Long, m: Long): Long =
    ((id % 1000003L) * 131071L + 99991L) % 1000003L % m

  private def bucket(g: String): Long =
    g.zipWithIndex.map { case (c, i) =>
      c.toInt.toLong * (1 + (131 * (i + 1)) % 997)
    }.sum % 4096

  private def expected(texts: Seq[String]): Seq[(Long, Long, Long, Long, Long)] = {
    val B = 4096L
    val ds = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t.split(" ").toSeq) }
      .filter(_._2.size >= 2)
    // Seq of ((id, b), n), NOT a Map keyed by b downstream: collecting
    // (b, n) pairs out of a Map silently collapses same-bucket entries
    // from different docs (caught by the first replica run disagreeing
    // with the Spark/DuckDB pair, which agreed with each other)
    val fbc = ds.flatMap { case (id, ws) =>
      ws.sliding(2).map(p => (id, bucket(p(0) + " " + p(1)))).toSeq
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }.toSeq
    val cq = fbc.groupBy(_._1._2).map { case (b, m) => b -> m.map(_._2).sum }
    val ct = fbc.collect { case ((id, b), n) if coin(id, 10L) == 0L => (b, n) }
      .groupBy(_._1).map { case (b, m) => b -> m.map(_._2).sum }
    val totq = cq.values.sum
    val tott = ct.values.sum
    ds.map { case (id, _) =>
      val feats = fbc.collect { case ((d, b), n) if d == id => (b, n) }
      val nf = feats.map(_._2).sum
      val sumr = feats.map { case (b, nd) =>
        val r = (BigInt(ct.getOrElse(b, 0L) + 1) * (totq + B) * 10000) /
          (BigInt(cq(b) + 1) * (tott + B))
        nd * r.toLong
      }.sum
      val w = sumr / nf
      val keep = if (coin(id, 10000L) < math.min(10000L, w)) 1L else 0L
      (id, nf, sumr, w, keep)
    }.sortBy(_._1)
  }

  test("C46 dense replica: bucket, smoothed models, ratios, coin agree row-for-row") {
    // ids 12 and 15 land in the target split under the C19 coin
    // (coin(12,10) == 0, coin(15,10) == 0); the rest are raw corpus
    val texts = (0 until 16).map {
      case 12 => "alpha beta alpha beta gamma"
      case 15 => "alpha beta delta gamma beta"
      case 3  => "alpha beta gamma zulu"   // shares target bigrams
      case 7  => "oscar november kilo"     // bigrams the target never saw
      case i  => s"word$i filler word${i % 5} tail$i"
    }
    assert(coin(12, 10) == 0 && coin(15, 10) == 0,
      "spec premise: ids 12/15 are the target split")
    val out = SparkEntry.queries("text_importance_resample")(spark, corpus("replica", texts))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(out == expected(texts),
      s"spark=${out.take(5)}... expected=${expected(texts).take(5)}...")
  }

  test("C46 target-like documents out-weigh off-distribution documents") {
    val texts = (0 until 16).map {
      case 12 => "alpha beta alpha beta gamma"
      case 15 => "alpha beta delta gamma beta"
      case 3  => "alpha beta gamma zulu"
      case 7  => "oscar november kilo"
      case i  => s"word$i filler word${i % 5} tail$i"
    }
    val w = SparkEntry.queries("text_importance_resample")(spark, corpus("sem", texts))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(w(3L) > w(7L),
      s"doc sharing target bigrams must out-weigh an off-distribution doc: ${w(3L)} vs ${w(7L)}")
    // and a target doc is (trivially) target-typical
    assert(w(12L) > w(7L), s"${w(12L)} vs ${w(7L)}")
  }

  test("C46 real data: coverage, non-negative weights, keep is exactly the coin rule") {
    val dir = sf("sf0.001")
    val out = SparkEntry.queries("text_importance_resample")(spark, dir).collect()
    assert(out.nonEmpty)
    val eligible = graft.core.Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("size(split(text, ' ')) >= 2")).count()
    assert(out.length.toLong == eligible)
    out.foreach { r =>
      val (id, nf, sumr, w, keep) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nf > 0 && sumr >= 0 && w >= 0, s"doc $id: nf=$nf sumr=$sumr w=$w")
      assert(w == sumr / nf, s"doc $id: w_bp must be the truncating mean")
      val expectKeep = if (coin(id, 10000L) < math.min(10000L, w)) 1L else 0L
      assert(keep == expectKeep, s"doc $id: keep=$keep expected=$expectKeep")
    }
    // resampling must be selective in both directions at this scale
    assert(out.exists(_.getLong(4) == 1L) && out.exists(_.getLong(4) == 0L),
      "keep must be non-degenerate on real data")
  }

  test("D14 resample-at-ingest ≡ batch C46 row-for-row (shared operator body)") {
    val dir = sf("sf0.001")
    val batch = SparkEntry.queries("text_importance_resample")(spark, dir)
      .collect().toSeq
    val stream = SparkEntry.queries("text_importance_resample_stream")(spark, dir)
      .collect().toSeq
    assert(stream.nonEmpty && stream == batch,
      s"stream (${stream.size}) must equal batch (${batch.size}) exactly")
  }
}
