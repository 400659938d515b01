package graft

/** C7b `ann_filtered` — the per-query label predicate must hold on every
  * result row, and the filtered top-k must equal a driver-side exact
  * reference (brute force within the query's label class).
  */
class AnnFilteredSpec extends SparkSpec {

  private lazy val emb: Map[Long, (Int, Array[Double])] = {
    val rows = spark.read.parquet(s"${sf()}/embeddings.parquet").collect()
    rows.map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      r.getLong(0) -> (r.getInt(2), v)
    }.toMap
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / math.sqrt(na * nb)
  }

  test("C7b every result row satisfies the query's label predicate") {
    val out = SparkEntry.queries("ann_filtered")(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (qLabel, _) = emb(r.getLong(0))
      val (nLabel, _) = emb(r.getLong(2))
      assert(qLabel == nLabel,
        s"result ${r.getLong(2)} (label $nLabel) violates query ${r.getLong(0)}'s filter ($qLabel)")
    }
  }

  test("C7b filtered top-k equals exact brute force within the label class") {
    val out = SparkEntry.queries("ann_filtered")(spark, sf()).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    val queries = emb.filter(_._1 < 10)
    queries.foreach { case (qid, (ql, qv)) =>
      val expect = emb.toSeq
        .collect { case (id, (l, v)) if id >= 10 && l == ql => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP), id) }
        .take(5).map(_._1)
      val got = out.getOrElse(qid, Seq.empty)
      assert(got == expect, s"query $qid: got $got expected $expect")
    }
    assert(out.values.map(_.size).sum > 0, "filtered search returned nothing at all")
  }

  test("C7c IVF-filtered: predicate holds on every row, scores exact (recall is inv-gated at sf0.01+)") {
    val out = SparkEntry.queries("ann_filtered_ivf")(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ql, qv) = emb(r.getLong(0))
      val (nl, nv) = emb(r.getLong(2))
      assert(ql == nl, s"IVF-filtered served cross-label pair (${r.getLong(0)}, ${r.getLong(2)})")
      val rounded = BigDecimal(cos(qv, nv)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - rounded) <= 1e-9,
        "IVF-filtered must score with the exact cosine path")
    }
  }

  test("C7b filtered results are a subset-ordering of nothing weaker: scores match unfiltered exact scoring") {
    // any (q, n) pair's reported cosine must equal the exact cosine of the
    // raw vectors to the reported rounding (4 decimals)
    val out = SparkEntry.queries("ann_filtered")(spark, sf()).collect()
    out.foreach { r =>
      val exact = cos(emb(r.getLong(0))._2, emb(r.getLong(2))._2)
      val rounded = BigDecimal(exact).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - rounded) <= 1e-9,
        s"reported score drifts from exact cosine for pair (${r.getLong(0)}, ${r.getLong(2)})")
    }
  }
}
