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

  test("D12 classifier-at-ingest ≡ batch C31b row-for-row (shared operator body)") {
    val dir = sf("sf0.001")
    val batch = SparkEntry.queries("text_quality_classifier_weights")(spark, dir).collect().toSeq
    val stream = SparkEntry.queries("text_quality_classifier_stream")(spark, dir).collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }
}
