package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling measurement for the similarity-dedup kernels: run the exact
  * prefix-filtered AllPairs join (and the MinHash-LSH path) on synthetic
  * corpora at two sizes (4x apart) and report the wall-time ratio. The
  * 100 TB claim for these operators is that candidate generation is
  * bucketed, never all-pairs — so 4x the documents must cost ~4-6x
  * (shuffle + sort log factors), NOT 16x. The corpus is adversarial on
  * purpose: every document is ~1/4 stop-words (high-document-frequency
  * grams that would blow up a naive inverted index), and 10% of
  * documents are planted near-duplicates so the verify stage has real
  * work. Deterministic (hash-derived words, no RNG state) so reruns and
  * machines agree on the workload. Numbers land in SURVEY §11.
  */
object DedupScale {

  /** n docs of 40 words from a 500-word vocab, every 4th word one of 5
    * stop-words; docs with id % 10 == 9 are a copy of id - 9's text with
    * two words edited. Word 0 touches 1 trigram and word 20 touches 3,
    * so each side keeps 4 unique grams: |∩| = 34, |∪| = 42, jacc =
    * 0.8095 — the planted pairs clear tau = 0.8 by design margin ~0.01,
    * so DO NOT edit a third word or raise tau without redoing this
    * arithmetic (a third edit drops jacc to ~0.65 and the verify stage
    * silently loses all planted work).
    */
  private def corpus(spark: SparkSession, n: Long): DataFrame = {
    val base = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", expr(
        """transform(sequence(0, 39), i ->
          |  CASE WHEN i % 4 = 3
          |    THEN element_at(array('the','a','of','and','to'), int(pmod(xxhash64(id, i), 5)) + 1)
          |    ELSE concat('w', pmod(xxhash64(id * 41 + i), 500))
          |  END)""".stripMargin)).as("text"))
    // planted near-dups: id % 10 == 9 re-derives id-9's words, editing
    // positions 0 and 20 — jacc 34/42 = 0.8095 (see scaladoc arithmetic)
    base.withColumn("text", when(col("doc_id") % 10 === 9, concat_ws(" ", expr(
      """transform(sequence(0, 39), i ->
        |  CASE WHEN i = 0 OR i = 20 THEN concat('edit', doc_id)
        |  WHEN i % 4 = 3
        |    THEN element_at(array('the','a','of','and','to'), int(pmod(xxhash64(doc_id - 9, i), 5)) + 1)
        |  ELSE concat('w', pmod(xxhash64((doc_id - 9) * 41 + i), 500))
        |  END)""".stripMargin))).otherwise(col("text")))
  }

  private def med3(f: => Long): (Long, Double) = Timing.med3(f)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val small = sys.env.getOrElse("SPARK_GRAFT_DEDUP_SMALL", "25000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // corpora are materialized ONCE, OUTSIDE the timed window (synthesis
    // is O(n) and would dilute a super-linear kernel toward 4x — the very
    // claim being tested), and shared by both kernels
    val warm = corpus(spark, small / 5).localCheckpoint(true)
    val d1 = corpus(spark, small).localCheckpoint(true)
    val d4 = corpus(spark, small * 4).localCheckpoint(true)
    Seq(("allpairs", (d: DataFrame) =>
      queries.Dedup.ngramJaccardPairs(d, 4, 5).count()),
      ("minhash", (d: DataFrame) =>
        queries.Dedup.minhashLshPairs(d, 4, 5).count())
    ).foreach { case (name, run) =>
      // warm once at a small size so JIT/codegen cost doesn't inflate
      // the small-run denominator (which would understate the ratio)
      run(warm)
      val (p1, t1) = med3(run(d1))
      val (p2, t2) = med3(run(d4))
      println(f"[dedupscale] $name: $small%d docs -> $p1 pairs in $t1%.1f s; " +
        f"${small * 4}%d docs -> $p2 pairs in $t2%.1f s; 4x data = ${t2 / t1}%.1f x time (median-of-3)")
    }
    Seq(warm, d1, d4).foreach(_.unpersist())
    spark.stop()
  }
}
