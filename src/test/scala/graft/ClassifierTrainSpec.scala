package graft

import org.apache.spark.sql.functions._

import graft.queries.Train

/** C31c — distributed logistic-regression distillation. Load-bearing
  * check: an INDEPENDENT dense replay of the whole optimization
  * (z-score matrix, batch GD, same constants) over the collected
  * counts must agree with the distributed trainer — weights to 1e-6,
  * predictions exactly. Plus a hand-separable toy corpus and the
  * accuracy gate on real data.
  */
class ClassifierTrainSpec extends SparkSpec {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def cntsFrame(rows: Seq[(Long, Long, Double)]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("bucket", LongType, nullable = false),
      StructField("c", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (d, b, c) => Row(d, b, c) }: _*), schema)
  }

  private def labelsFrame(rows: Seq[(Long, Double)]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("y", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (d, y) => Row(d, y) }: _*), schema)
  }

  test("toy corpus: separable buckets get opposite-sign weights, perfect predictions") {
    val cnts = cntsFrame(Seq(
      (1L, 100L, 2.0), (2L, 100L, 3.0), // positive docs carry bucket 100
      (3L, 200L, 2.0), (4L, 200L, 1.0))) // negative docs carry bucket 200
    val labels = labelsFrame(Seq(1L -> 1.0, 2L -> 1.0, 3L -> 0.0, 4L -> 0.0))
    val m = Train.logisticTrain(cnts, labels)
    assert(m.weights(100L) > 0 && m.weights(200L) < 0,
      s"separable weights have wrong signs: ${m.weights}")
    val preds = Train.predict(spark, cnts, labels, m)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(preds.forall { case (_, y, p) => y == p }, s"toy corpus not learned: ${preds.toSeq}")
    // loss decreased overall (full-batch GD on a separable toy)
    assert(m.losses.last < m.losses.head, s"loss did not improve: ${m.losses}")
  }

  test("sampled trainer generalizes: sample-trained model scores the full corpus within 3pp of full-batch accuracy") {
    val d = graft.core.Tables(spark, sf(), "documents")
    // force a real sample at this 500-doc scale (the shipped budget
    // only bites at sf1+): ~1/4 of the corpus
    val dS = Train.trainSample(d, target = 125L)
    val nS = dS.count()
    assert(nS > 50 && nS < 250, s"hash-mod sample out of range: $nS of 500")
    def acc(preds: org.apache.spark.sql.DataFrame): Double = {
      val rows = preds.collect().map(r => (r.getLong(1), r.getLong(2)))
      rows.count { case (y, p) => y == p }.toDouble / rows.length
    }
    val (docsS, labelsSeq) = Train.collectSample(
      Train.bucketCounts(dS), Train.distillLabels(dS))
    val mS = Train.logisticTrainDriver(docsS, labelsSeq)
    val cnts = Train.bucketCounts(d).localCheckpoint(true)
    val labels = Train.distillLabels(d).localCheckpoint(true)
    val mF = Train.logisticTrain(cnts, labels)
    val accS = acc(Train.predict(spark, cnts, labels, mS))
    val accF = acc(Train.predict(spark, cnts, labels, mF))
    Seq(cnts, labels).foreach(_.unpersist())
    assert(accS >= accF - 0.03,
      s"sample-trained full-corpus accuracy $accS fell >3pp below full-batch $accF")
  }

  test("driver-loop trainers == distributed trainers on the same input (weights 1e-6)") {
    val d = graft.core.Tables(spark, sf(), "documents")
    val cnts = Train.bucketCounts(d).localCheckpoint(true)
    val labels = Train.distillLabels(d).localCheckpoint(true)
    val mDist = Train.logisticTrain(cnts, labels, iters = 10)
    val (docsA, lsA) = Train.collectSample(cnts, labels)
    val mDrv = Train.logisticTrainDriver(docsA, lsA, iters = 10)
    assert(mDist.weights.keySet == mDrv.weights.keySet)
    mDist.weights.foreach { case (b, w) =>
      assert(math.abs(w - mDrv.weights(b)) < 1e-6, s"logistic bucket $b: $w vs ${mDrv.weights(b)}")
    }
    assert(math.abs(mDist.bias - mDrv.bias) < 1e-6)

    val lang = Train.langidTeacher(d).localCheckpoint(true)
    val nC = Train.LangClasses.size
    val sDist = Train.softmaxTrain(cnts, lang, nC, iters = 8)
    val (docsB, lsB) = Train.collectSample(cnts, lang)
    val sDrv = Train.softmaxTrainDriver(docsB, lsB, nC, iters = 8)
    assert(sDist.weights.keySet == sDrv.weights.keySet)
    sDist.weights.foreach { case (bc, w) =>
      assert(math.abs(w - sDrv.weights(bc)) < 1e-6, s"softmax $bc: $w vs ${sDrv.weights(bc)}")
    }
    sDist.biases.foreach { case (c, b) =>
      assert(math.abs(b - sDrv.biases(c)) < 1e-6, s"softmax bias $c")
    }
    Seq(cnts, labels, lang).foreach(_.unpersist())
  }

  test("distributed trainer == dense driver replay (weights 1e-6, predictions exact)") {
    val d = graft.core.Tables(spark, sf(), "documents")
    val cnts = Train.bucketCounts(d).localCheckpoint(true)
    val labels = Train.distillLabels(d).localCheckpoint(true)
    val m = Train.logisticTrain(cnts, labels)

    // dense replay from collected counts — independent arithmetic
    val crows = cnts.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lrows = labels.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val docs = lrows.map(_._1)
    val docIdx = docs.zipWithIndex.toMap
    val buckets = crows.map(_._2).distinct.sorted
    val bIdx = buckets.zipWithIndex.toMap
    val n = docs.length
    val mat = Array.ofDim[Double](n, buckets.length)
    crows.foreach { case (d0, b, c) => mat(docIdx(d0))(bIdx(b)) = c }
    val y = lrows.map(_._2)
    val mu = buckets.indices.map(j => docs.indices.map(i => mat(i)(j)).sum / n).toArray
    val sd = buckets.indices.map { j =>
      val v = docs.indices.map(i => math.pow(mat(i)(j) - mu(j), 2)).sum / n
      if (v > 0) math.sqrt(v) else 1.0
    }.toArray
    val z = Array.tabulate(n, buckets.length)((i, j) => (mat(i)(j) - mu(j)) / sd(j))
    val w = new Array[Double](buckets.length)
    var bias = 0.0
    for (_ <- 1 to 20) {
      val p = docs.indices.map { i =>
        val s0 = buckets.indices.foldLeft(bias)((acc, j) => acc + w(j) * z(i)(j))
        1.0 / (1.0 + math.exp(-s0))
      }
      val r = docs.indices.map(i => p(i) - y(i))
      for (j <- buckets.indices)
        w(j) -= 2.0 * docs.indices.map(i => r(i) * z(i)(j)).sum / n
      bias -= 2.0 * r.sum / n
    }
    buckets.zipWithIndex.foreach { case (b, j) =>
      assert(math.abs(m.weights(b) - w(j)) < 1e-6,
        s"bucket $b: distributed ${m.weights(b)} vs replay ${w(j)}")
    }
    assert(math.abs(m.bias - bias) < 1e-6)
    val got = Train.predict(spark, cnts, labels, m)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = docs.indices.map { i =>
      val s0 = buckets.indices.foldLeft(bias)((acc, j) => acc + w(j) * z(i)(j))
      (docs(i), if (1.0 / (1.0 + math.exp(-s0)) >= 0.5) 1L else 0L)
    }
    assert(got.toSeq == want.toSeq)
    cnts.unpersist(); labels.unpersist()
  }

  test("inv_classifier_distill_accuracy: zero violations at sf0.001") {
    assert(SparkEntry.queries("inv_classifier_distill_accuracy")(spark, sf()).count() == 0)
  }

  test("C47b text_langid_router_int: per-class recall on every class " +
      "the teacher emits (the anti-collapse witness)") {
    // the FIRST router design (plain bias) collapsed to the majority
    // class with 0% und recall — this is the gate that caught it. The
    // corpus teacher emits en and und; both must be fully recovered.
    val out = SparkEntry.queries("text_langid_router_int")(spark, sf("sf0.01"))
      .collect()
    val byClass = out.groupBy(_.getLong(1))
    assert(byClass.keySet.size >= 2, "teacher should emit >= 2 classes here")
    byClass.foreach { case (cls, rows) =>
      if (rows.length >= 20) {
        val rec = rows.count(r => r.getLong(1) == r.getLong(2)).toDouble / rows.length
        assert(rec >= 0.95, s"class $cls recall $rec (n=${rows.length})")
      }
    }
  }

  test("C31d text_quality_regressor_int: the Cramer-trained model " +
      "imitates the C10 teacher (accuracy >= 0.90 at sf0.01)") {
    // the hash gate pins the ARITHMETIC; this pins that the trained
    // model is a real distillation, not a constant predictor
    // (measured 0.942 sf0.01 / 0.978 sf0.1 / 0.967 sf1)
    val out = SparkEntry.queries("text_quality_regressor_int")(spark, sf("sf0.01"))
      .collect()
    val acc = out.count(r => r.getLong(1) == r.getLong(2)).toDouble / out.length
    assert(acc >= 0.90, s"distillation accuracy $acc")
    // anti-collapse: both classes must actually be predicted
    assert(out.exists(_.getLong(2) == 0L) && out.exists(_.getLong(2) == 1L),
      "regressor collapsed to a constant predictor")
  }

  // ---- r8: distributed params + softmax ------------------------------

  /** r7 verdict #6: training must not collect the per-bucket gradient
    * to the driver every iteration. Absolute bytes are dominated by
    * per-task metric bookkeeping, so the MEASURED contract is scale
    * response: growing the occupied-bucket count 16x (same docs, same
    * partitioning, same job structure) must leave the marginal
    * per-iteration driver result bytes ~flat — the old shape moved
    * |occupied buckets| rows per iteration and would grow by
    * ~15k rows x ~25 B here (~384 KB+), far past the slack.
    */
  test("per-iteration driver traffic stays flat under 16x vocabulary growth") {
    def synthCnts(buckets: Int): org.apache.spark.sql.DataFrame = {
      var x = 5L
      def nxt(m: Int): Int = { x = x * 6364136223846793005L + 1442695040888963407L; (((x >>> 33) % m) + m).toInt % m }
      cntsFrame((0 until 500).flatMap { d0 =>
        (0 until 30).map(_ => (d0.toLong, nxt(buckets).toLong, 1.0 + nxt(3)))
      }.distinct).localCheckpoint(true)
    }
    val labels = labelsFrame((0 until 500).map(i => i.toLong -> (if (i % 3 == 0) 1.0 else 0.0)))
      .localCheckpoint(true)
    val small = synthCnts(1000)
    val big = synthCnts(16000)
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) bytes.addAndGet(t.taskMetrics.resultSize)
    }
    def drain(): Unit =
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus").invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(2000) }
    def measure(f: => Unit): Long = { drain(); bytes.set(0L); f; drain(); bytes.get() }
    spark.sparkContext.addSparkListener(listener)
    try {
      def perIter(cnts: org.apache.spark.sql.DataFrame): Long = {
        val one = measure { Train.logisticTrain(cnts, labels, iters = 1) }
        val nine = measure { Train.logisticTrain(cnts, labels, iters = 9) }
        (nine - one) / 8
      }
      val smallIter = perIter(small)
      val bigIter = perIter(big)
      info(s"marginal driver bytes/iteration: $smallIter @1k buckets, $bigIter @16k buckets")
      assert(bigIter < smallIter + 128 * 1024,
        s"per-iteration driver traffic grew with vocabulary: $smallIter -> $bigIter " +
          "(the old gradient-collect shape would add ~25 B per occupied bucket)")
    } finally spark.sparkContext.removeSparkListener(listener)
    Seq(small, big, labels).foreach(_.unpersist())
  }

  test("C47 softmax trainer == dense driver replay (weights 1e-6, predictions exact)") {
    val d = graft.core.Tables(spark, sf(), "documents")
    val cnts = Train.bucketCounts(d).localCheckpoint(true)
    val labels = Train.langidTeacher(d).localCheckpoint(true)
    val numC = Train.LangClasses.size
    val iters = 12
    val lr = 4.0
    val m = Train.softmaxTrain(cnts, labels, numC, iters, lr)

    val crows = cnts.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lrows = labels.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs = lrows.map(_._1)
    val docIdx = docs.zipWithIndex.toMap
    val buckets = crows.map(_._2).distinct.sorted
    val bIdx = buckets.zipWithIndex.toMap
    val n = docs.length
    val mat = Array.ofDim[Double](n, buckets.length)
    crows.foreach { case (d0, b, c) => mat(docIdx(d0))(bIdx(b)) = c }
    val y = lrows.map(_._2.toInt)
    val mu = buckets.indices.map(j => docs.indices.map(i => mat(i)(j)).sum / n).toArray
    val sd = buckets.indices.map { j =>
      val v = docs.indices.map(i => math.pow(mat(i)(j) - mu(j), 2)).sum / n
      if (v > 0) math.sqrt(v) else 1.0
    }.toArray
    val z = Array.tabulate(n, buckets.length)((i, j) => (mat(i)(j) - mu(j)) / sd(j))
    // class-balance weights: n / (|observed| · n_y), the trainer's rule
    val clsCounts = y.groupBy(identity).map { case (c, v) => c -> v.size }
    val a = y.map(c => n.toDouble / (clsCounts.size * clsCounts(c)))
    val w = Array.ofDim[Double](numC, buckets.length)
    val bias = new Array[Double](numC)
    for (_ <- 1 to iters) {
      val p = docs.indices.map { i =>
        val raw = (0 until numC).map(c =>
          buckets.indices.foldLeft(bias(c))((acc, j) => acc + w(c)(j) * z(i)(j)))
        val mx = raw.max
        val e = raw.map(v => math.exp(v - mx))
        val s0 = e.sum
        e.map(_ / s0)
      }
      val r = Array.tabulate(n, numC)((i, c) =>
        a(i) * (p(i)(c) - (if (y(i) == c) 1.0 else 0.0)))
      for (c <- 0 until numC) {
        for (j <- buckets.indices)
          w(c)(j) -= lr * docs.indices.map(i => r(i)(c) * z(i)(j)).sum / n
        bias(c) -= lr * docs.indices.map(i => r(i)(c)).sum / n
      }
    }
    for (c <- 0 until numC; (b, j) <- buckets.zipWithIndex)
      assert(math.abs(m.weights((b, c.toLong)) - w(c)(j)) < 1e-6,
        s"bucket $b class $c: distributed ${m.weights((b, c.toLong))} vs replay ${w(c)(j)}")
    for (c <- 0 until numC)
      assert(math.abs(m.biases(c.toLong) - bias(c)) < 1e-6)
    val got = Train.softmaxPredict(spark, cnts, labels, m)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = docs.indices.map { i =>
      val raw = (0 until numC).map(c =>
        buckets.indices.foldLeft(bias(c))((acc, j) => acc + w(c)(j) * z(i)(j)))
      // argmax with ties to the lowest class — the operator's rule
      (docs(i), raw.zipWithIndex.maxBy { case (v, c) => (v, -c) }._2.toLong)
    }
    assert(got.toSeq == want.toSeq)
    cnts.unpersist(); labels.unpersist()
  }

  test("inv_langid_distill_accuracy: zero violations at sf0.001") {
    assert(SparkEntry.queries("inv_langid_distill_accuracy")(spark, sf()).count() == 0)
  }

  test("D12 classifier-at-ingest ≡ batch C31b row-for-row (shared operator body)") {
    val dir = sf("sf0.001")
    val batch = SparkEntry.queries("text_quality_classifier_weights")(spark, dir).collect().toSeq
    val stream = SparkEntry.queries("text_quality_classifier_stream")(spark, dir).collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }
}
