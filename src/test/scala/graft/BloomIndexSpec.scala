package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.queries.Dedup

/** Pins the bucket-partitioned bloom index (C30b's extreme-scale form,
  * r5 verdict "What's wrong" #1):
  *   - exactness: indexed == plain incrementalExact for any bucket
  *     count, including nBuckets=1 (degenerate monolithic) and a
  *     persisted round-trip;
  *   - scan budget: the index build is ONE corpus pass (no counting
  *     pre-scan — per-bucket filters size from actual counts), and a
  *     probe against a pre-built index touches the corpus exactly once
  *     (AnnBuildScanSpec's accumulator-behind-a-repartition technique);
  *   - per-bucket probing: one filter deserialization per TOUCHED
  *     bucket per increment, never per row or per untouched bucket;
  *   - sizing: per-bucket filter bytes track that bucket's actual key
  *     count — no bucket carries a corpus-sized filter.
  */
class BloomIndexSpec extends SparkSpec {

  private def doc(tag: String, i: Int): String =
    s"$tag $i " + (0 until 8).map(j => "w" + ((i * 31 + j * 7 + tag.hashCode) % 500)).mkString(" ")

  private def frame(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("indexed == exact across random corpora, bucket counts, and a persisted round-trip") {
    val rnd = new scala.util.Random(47)
    for ((nBuckets, trial) <- Seq(1, 7, 64).zipWithIndex) {
      val vocabN = 40 + trial * 25
      def rdoc(): String = Seq.fill(4 + rnd.nextInt(6))("t" + rnd.nextInt(vocabN)).mkString(" ")
      val corpus = frame((0 until 400).map(i => (10000L + i, rdoc())))
      val corpusTexts = corpus.select("text").collect().map(_.getString(0))
      val batch = frame((0 until 300).map { i =>
        val t = if (rnd.nextInt(10) < 3) corpusTexts(rnd.nextInt(corpusTexts.length)) else rdoc()
        (i.toLong, t)
      })
      val exact = Dedup.incrementalExact(batch, corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val idx = Dedup.corpusBloomIndex(corpus, nBuckets)
      val viaIdx = Dedup.incrementalExactBloomIndexed(batch, corpus, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty && viaIdx == exact,
        s"nBuckets=$nBuckets: missed=${exact -- viaIdx} extra=${viaIdx -- exact}")
      // persisted round-trip: partitioned write + read serves the same probe
      val dir = Files.createTempDirectory(s"graft-bloomidx-$nBuckets")
      Dedup.writeBloomIndex(idx, dir.toString)
      val viaDisk = Dedup.incrementalExactBloomIndexed(
          batch, corpus, Dedup.readBloomIndex(spark, dir.toString))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaDisk == exact,
        s"nBuckets=$nBuckets persisted: missed=${exact -- viaDisk} extra=${viaDisk -- exact}")
    }
  }

  test("empty corpus: the index is empty and every batch row survives") {
    val corpus = frame(Seq.empty)
    val batch = frame((0 until 20).map(i => (i.toLong, doc("b", i % 15))))
    val idx = Dedup.corpusBloomIndex(corpus, nBuckets = 8)
    assert(idx.count() == 0)
    val got = Dedup.incrementalExactBloomIndexed(batch, corpus, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.incrementalExact(batch, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact && got.nonEmpty)
  }

  private val parts = 3

  private def instrumented(rows: Seq[(Long, String)]): (LongAccumulator, DataFrame) = {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("corpus-partition-scans")
    val ds = rows.toDS().repartition(parts).mapPartitions { it => acc.add(1); it }
    (acc, ds.toDF("doc_id", "text"))
  }

  test("scan budget: build = one corpus pass; pre-built-index probe = one corpus pass") {
    val corpusRows = (0 until 200).map(i => (1000L + i, doc("c", i)))
    val batchRows = (0 until 90).map { i =>
      if (i % 10 == 0) (i.toLong, doc("c", i)) else (i.toLong, doc("b", i))
    }
    // build: the per-bucket aggregation sizes filters from actual
    // counts, so there is NO counting pre-scan — exactly parts
    // partition executions for the whole build
    val (accB, corpusB) = instrumented(corpusRows)
    val idx = Dedup.corpusBloomIndex(corpusB, nBuckets = 8).localCheckpoint(true)
    assert(accB.value == parts.toLong,
      s"index build: ${accB.value} partition scans, expected $parts (one corpus pass)")
    // probe: with the index pre-built, the only corpus touch is the
    // exact-membership semi-join of the might-positive sliver
    val (accP, corpusP) = instrumented(corpusRows)
    val before = Dedup.bloomProbeDeserializations.get()
    val got = Dedup.incrementalExactBloomIndexed(frame(batchRows), corpusP, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(accP.value == parts.toLong,
      s"probe: ${accP.value} partition scans, expected $parts (one corpus pass)")
    // per-bucket probing: one deserialization per TOUCHED bucket that
    // exists in the index (local-mode counter — single JVM)
    val touched = frame(batchRows)
      .select(pmod(xxhash64(lower(regexp_replace(trim(col("text")), "\\s+", " "))), lit(8))
        .cast("int").as("b")).distinct().collect().map(_.getInt(0)).toSet
    val inIndex = idx.select(col("bucket")).collect().map(_.getInt(0)).toSet
    val expected = (touched intersect inIndex).size.toLong
    assert(Dedup.bloomProbeDeserializations.get() - before == expected,
      s"probe deserialized ${Dedup.bloomProbeDeserializations.get() - before} filters, " +
        s"expected one per touched indexed bucket ($expected)")
    // and the result is still exact
    val exact = Dedup.incrementalExact(frame(batchRows), frame(corpusRows))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
    idx.unpersist()
  }

  test("per-bucket filters are exactly sized: n_keys sums to corpus rows, bytes track bucket counts") {
    val corpus = frame((0 until 500).map(i => (i.toLong, doc("c", i % 450)))) // some dup texts
    val idx = Dedup.corpusBloomIndex(corpus, nBuckets = 16)
      .select(col("bucket"), col("n_keys"), length(col("bloom")).as("bytes"))
      .collect()
    assert(idx.map(_.getLong(1)).sum == 500L,
      "n_keys must account for every corpus digest (dup texts included)")
    idx.foreach { r =>
      val (nKeys, bytes) = (r.getLong(1), r.getInt(2))
      // 3% fpp ≈ 7.3 bits/key ≈ 0.92 B/key; allow 2x + header slack,
      // which still catches any bucket sized for the whole corpus
      assert(bytes <= 2 * nKeys + 64,
        s"bucket ${r.getInt(0)}: $bytes B for $nKeys keys — not exactly sized?")
    }
  }
}
