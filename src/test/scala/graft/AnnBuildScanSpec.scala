package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator

import graft.queries.Ann

/** Pins the CORPUS SCAN BUDGET of the ANN index builds (r4 verdict
  * finding #3: ivfBuild touched the corpus 3× — count, sample scan,
  * assignment — with no way to avoid it). The corpus is instrumented
  * with an accumulator behind a repartition, so every result-stage
  * execution of the corpus adds `parts`:
  *   - default build: count + sample scan      → 2·parts
  *   - knownCount:    sample scan only         → 1·parts
  *   - trainingSample: NO eager corpus touch   → 0, and consuming the
  *     assignment afterwards is the single corpus pass.
  * The pre-sampled path must also train the SAME quantizer as the
  * default path when handed the sample the default path would draw.
  */
class AnnBuildScanSpec extends SparkSpec {

  private val parts = 3
  private val n = 100

  private def rows: Seq[(Long, Seq[Double], Double)] =
    (0 until n).map { i =>
      val e = Array.tabulate(4)(d => math.sin(i * 4 + d + 1))
      (i.toLong, e.toSeq, math.sqrt(e.map(x => x * x).sum))
    }

  private def instrumentedCorpus(): (LongAccumulator, DataFrame) = {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("corpus-partition-scans")
    val ds = spark.createDataset(rows).repartition(parts)
      .mapPartitions { it => acc.add(1); it }
    (acc, ds.toDF("vec_id", "emb", "nrm"))
  }

  // the sample the DEFAULT path draws at this size: sampleMod =
  // max(1, 100/2000) = 1 keeps every row, ordered by vec_id — so the
  // whole corpus, uninstrumented, is the equivalent stored sample table
  private def plainSample(): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF("vec_id", "emb", "nrm")
  }

  test("ivfBuild scan budget: default 2 scans, knownCount 1, trainingSample 0+1") {
    val (a0, c0) = instrumentedCorpus()
    val d0 = Ann.ivfBuild(c0, k = 4)
    assert(a0.value == 2L * parts, s"default build: ${a0.value} partition scans, expected ${2 * parts}")

    val (a1, c1) = instrumentedCorpus()
    Ann.ivfBuild(c1, k = 4, knownCount = n.toLong)
    assert(a1.value == 1L * parts, s"knownCount build: ${a1.value} partition scans, expected $parts")

    val (a2, c2) = instrumentedCorpus()
    val idx = Ann.ivfBuild(c2, k = 4, trainingSample = Some(plainSample()))
    assert(a2.value == 0L, s"pre-sampled build touched the corpus eagerly (${a2.value} scans)")
    assert(idx.assigned.count() == n.toLong)
    assert(a2.value == 1L * parts,
      s"consuming the assignment should be the single corpus pass, got ${a2.value}")

    // identical training input ⇒ identical quantizer
    assert(d0.cents.map(_.toSeq).toSeq == idx.cents.map(_.toSeq).toSeq,
      "pre-sampled training diverged from the default path's quantizer")
  }

  test("pqBuild scan budget: default 2 scans, knownCount 1, trainingSample 0") {
    val (a0, c0) = instrumentedCorpus()
    val d0 = Ann.pqBuild(c0, m = 2, k = 4)
    assert(a0.value == 2L * parts, s"default build: ${a0.value} partition scans, expected ${2 * parts}")

    val (a1, c1) = instrumentedCorpus()
    Ann.pqBuild(c1, m = 2, k = 4, knownCount = n.toLong)
    assert(a1.value == 1L * parts, s"knownCount build: ${a1.value} partition scans, expected $parts")

    val (a2, c2) = instrumentedCorpus()
    val idx = Ann.pqBuild(c2, m = 2, k = 4, trainingSample = Some(plainSample()))
    assert(a2.value == 0L, s"pre-sampled build touched the corpus eagerly (${a2.value} scans)")
    assert(d0.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "pre-sampled training diverged from the default path's codebooks")
  }

  test("ivfPqBuild passes knownCount through: 2 scans total (sample + residual sample)") {
    val (a, c) = instrumentedCorpus()
    Ann.ivfPqBuild(c, kCells = 4, m = 2, k = 4, knownCount = n.toLong)
    // ivfBuild sample scan + residual sampledUnits scan over assigned
    // (which re-reads the corpus through the assignment projection)
    assert(a.value == 2L * parts,
      s"knownCount ivfpq build: ${a.value} partition scans, expected ${2 * parts}")
  }

  test("ivfPqBuild deployment path (trainingSample + knownCount): 1 eager scan") {
    val (a, c) = instrumentedCorpus()
    Ann.ivfPqBuild(c, kCells = 4, m = 2, k = 4, knownCount = n.toLong,
      trainingSample = Some(plainSample()))
    // only the residual sampler touches the corpus eagerly; coarse
    // training comes from the stored sample, the count from metadata
    assert(a.value == 1L * parts,
      s"deployment ivfpq build: ${a.value} partition scans, expected $parts")
  }

  /** C8g: the persisted-probe read path must PRUNE the cell-partitioned
    * index at file-listing time — the probed-cell filter has to land in
    * the scan's PartitionFilters (storage-level p-of-k pruning), not as
    * a post-read row filter. First call builds the artifact; the plan
    * under test is the loaded-index probe.
    */
  test("ann_ivf_probe prunes the cell-partitioned index read") {
    val dir = sf("sf0.001")
    val df = SparkEntry.queries("ann_ivf_probe")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator
      .find(l => l.contains("Scan parquet") && l.contains("ann_index"))
    assert(scanLine.isDefined, s"expected a persisted-index scan:\n$p")
    assert(scanLine.get.contains("PartitionFilters: [") &&
      !scanLine.get.replaceAll(".*PartitionFilters: \\[", "").startsWith("]"),
      s"probed cells must prune partitions at the index scan:\n${scanLine.get}")
  }

  /** Same pin for the INTEGER family's persisted probe (r12 verdict
    * #6): the hash-gated deployment read path must prune the
    * cell-partitioned integer index at file-listing time too.
    */
  test("ann_ivf_int_probe prunes the cell-partitioned integer index read") {
    val dir = sf("sf0.001")
    val df = SparkEntry.queries("ann_ivf_int_probe")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // match on ann_index (the path truncates before the ivf_int_k8
    // subdir in plan strings); this query scans only its own artifact
    val scanLine = p.linesIterator
      .find(l => l.contains("Scan parquet") && l.contains("ann_index"))
    assert(scanLine.isDefined, s"expected a persisted integer-index scan:\n$p")
    assert(scanLine.get.contains("PartitionFilters: [") &&
      !scanLine.get.replaceAll(".*PartitionFilters: \\[", "").startsWith("]"),
      s"probed cells must prune partitions at the integer index scan:\n${scanLine.get}")
  }
}
