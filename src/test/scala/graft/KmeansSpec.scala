package graft

import org.apache.spark.sql.functions._

/** C39/C39b — distributed integer Lloyd's k-means + cluster-balanced
  * selection. The load-bearing check is REPLAY EQUALITY: an independent
  * pure-Scala Lloyd run (quantize → assign → floor-mean → repeat, K=8,
  * 4 iterations — the operator contract's constants) over the collected
  * embeddings must reproduce the distributed operator's output
  * row-for-row, including distances and tie-breaks. That pins the whole
  * iterative path (seeding, empty-cell carry-over, floor division,
  * lowest-cluster tie rule) without trusting any of the operator's own
  * arithmetic.
  */
class KmeansSpec extends SparkSpec {

  private val K = 8 // keep in lockstep with Cluster.K / Cluster.ITERS
  private val ITERS = 4

  /** Independent reference implementation over raw (vec_id, floats). */
  private def naive(rows: Seq[(Long, Seq[Float])]): Seq[(Long, Int, Long)] = {
    val pts = rows.sortBy(_._1).map { case (id, vs) =>
      id -> vs.map(v => math.floor((v.toDouble + 1.0) * 1000).toLong).toArray
    }
    val dim = pts.head._2.length
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var cents: Array[Array[Long]] = pts.take(K).map(_._2.clone()).toArray
    for (_ <- 1 to ITERS) {
      val assign: Seq[(Int, Array[Long])] = pts.map { case (_, q) =>
        ((0 until K).minBy(c => (d2(q, cents(c)), c)), q)
      }
      val next = cents.map(_.clone())
      for (c <- 0 until K) {
        val members = assign.collect { case (`c`, q) => q }
        if (members.nonEmpty)
          next(c) = Array.tabulate(dim)(d =>
            members.map(_(d)).sum / members.length) // positive: trunc == floor
      }
      cents = next
    }
    pts.map { case (id, q) =>
      val best = (0 until K).minBy(c => (d2(q, cents(c)), c))
      (id, best, d2(q, cents(best)))
    }
  }

  private def rawEmbs(dir: String): Seq[(Long, Seq[Float])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

  test("emb_kmeans equals an independent pure-Scala Lloyd replay, row for row") {
    val expect = naive(rawEmbs(sf()))
    val got = SparkEntry.queries("emb_kmeans")(spark, sf())
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got == expect.sortBy(_._1),
      s"distributed vs naive mismatch; first diffs: " +
        got.zip(expect).filter { case (a, b) => a != b }.take(3))
  }

  test("emb_kmeans: every vector appears exactly once; clusters are 0..K-1") {
    val got = SparkEntry.queries("emb_kmeans")(spark, sf()).collect()
    val n = rawEmbs(sf()).size
    assert(got.length == n)
    assert(got.map(_.getLong(0)).distinct.length == n)
    assert(got.forall(r => r.getInt(1) >= 0 && r.getInt(1) < K))
  }

  test("emb_kmeans_balance: per-cluster quota holds and keeps the most central members") {
    val asg = SparkEntry.queries("emb_kmeans")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val bal = SparkEntry.queries("emb_kmeans_balance")(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
    val quota = (asg.length + K - 1) / K
    val byCluster = bal.groupBy(_._1)
    assert(byCluster.values.forall(_.length <= quota),
      s"cluster over quota $quota: ${byCluster.view.mapValues(_.length).toMap}")
    // selected set per cluster == the quota-prefix of (dist, vec_id) order
    for ((c, rows) <- byCluster) {
      val expectIds = asg.filter(_._2 == c).sortBy(t => (t._3, t._1))
        .take(quota).map(_._1).toSet
      assert(rows.map(_._3).toSet == expectIds, s"cluster $c selection drifted")
      // ranks are 1..m in (dist, vec_id) order
      assert(rows.sortBy(_._2).map(_._2).toSeq == (1L to rows.length).toSeq)
    }
    // every cluster present in the assignment is represented
    assert(byCluster.keySet == asg.map(_._2).toSet)
  }

  test("D11 emb_assign_stream ≡ emb_kmeans row-for-row (same model, stream inference)") {
    val dir = sf("sf0.001")
    val batch = SparkEntry.queries("emb_kmeans")(spark, dir).collect().toSeq
    val stream = SparkEntry.queries("emb_assign_stream")(spark, dir).collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("emb_kmeans plan: one embeddings scan, assignment never shuffles the corpus") {
    val p = SparkEntry.queries("emb_kmeans")(spark, sf())
      .queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan"))
    assert(scans == 1, s"expected exactly one corpus scan, got $scans:\n$p")
    // the only exchange is the presentation ORDER BY's range partitioning
    // — a hash exchange would mean the assignment pass shuffled the corpus
    val hashEx = p.linesIterator.filter(_.contains("Exchange"))
      .filter(_.contains("hashpartitioning")).toSeq
    assert(hashEx.isEmpty, s"assignment pass must not hash-shuffle:\n$hashEx")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"assignment must be a pure projection, not a join:\n$p")
  }
}
