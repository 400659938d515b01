package graft

import org.apache.spark.sql.functions._

/** C18c — the corpus data card. Checks internal consistency (sections
  * must reconcile with each other and with the raw table) and the plan
  * contract: the lang/source/split/corpus compositions ride ONE
  * grouping-sets aggregation (an Expand over a single base scan), not a
  * scan+shuffle per dimension.
  */
class DataCardSpec extends SparkSpec {

  private def card(dir: String = sf()): Map[(String, String), Long] =
    SparkEntry.queries("pipeline_data_card")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("data card sections reconcile with each other and the raw table") {
    val c = card()
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val nDocs = docs.count()
    val nChars = docs.agg(sum("n_chars")).head.getLong(0)
    assert(c(("corpus", "docs")) == nDocs)
    assert(c(("corpus", "chars")) == nChars)
    assert(c(("corpus", "mean_chars")) == nChars / nDocs)
    // per-dimension sections partition the corpus
    def sectionSum(prefix: String, metric: String): Long =
      c.collect { case ((s, m), v) if s.startsWith(prefix) && m == metric => v }.sum
    assert(sectionSum("lang:", "docs") == nDocs)
    assert(sectionSum("source:", "docs") == nDocs)
    assert(sectionSum("split:", "docs") == nDocs)
    assert(sectionSum("split:", "chars") == nChars)
    assert(c(("quality", "min_bp")) <= c(("quality", "mean_bp")) &&
      c(("quality", "mean_bp")) <= c(("quality", "max_bp")))
    // dedup section agrees with an independent recount on the same key
    val groups = docs
      .groupBy(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
      .count().where(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L)), count(lit(1))).head
    assert(c(("dedup", "exact_dup_docs")) == groups.getLong(0))
    assert(c(("dedup", "exact_dup_groups")) == groups.getLong(1))
  }

  test("data card plan: one grouping-sets pass, three base scans total") {
    val p = SparkEntry.queries("pipeline_data_card")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"expected a grouping-sets Expand:\n$p")
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan"))
    assert(scans == 3,
      s"expected 3 scans (grouping sets + distinct words + dup digests), got $scans:\n$p")
  }

  test("C18d incremental card == full card row-for-row at sf0.001") {
    val full = SparkEntry.queries("pipeline_data_card")(spark, sf()).collect()
      .map(_.toSeq)
    val incr = SparkEntry.queries("pipeline_data_card_incremental")(spark, sf())
      .collect().map(_.toSeq)
    assert(full.nonEmpty && incr.toSeq == full.toSeq)
  }

  test("C18d merge accounts a delta doc duplicating a BASE doc (cross-side group)") {
    // two identical texts land on opposite sides of the doc_id % 7 == 3
    // split (ids 1 and 3): only the digest-SUM sidecar merge can see
    // them as one group of 2 — per-side dup metrics would read 0
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    val rows = Seq(
      Row(1L, "same doc twice", "en", "web", 14L),
      Row(3L, "same doc twice", "en", "web", 14L),
      Row(4L, "a different doc", "en", "web", 15L))
    val d = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val dBase = d.where(col("doc_id") % 7 =!= 3)
    val dDelta = d.where(col("doc_id") % 7 === 3)
    val merged = graft.queries.Text.cardDigestCounts(dBase)
      .unionAll(graft.queries.Text.cardDigestCounts(dDelta))
      .groupBy(col("h")).agg(sum(col("c")).as("c"))
    val dup = merged.where(col("c") > 1).collect()
    assert(dup.length == 1 && dup.head.getLong(1) == 2L,
      "cross-side duplicate group must merge to c=2")
    // and neither side alone sees it
    assert(graft.queries.Text.cardDigestCounts(dBase).where(col("c") > 1).count() == 0)
    assert(graft.queries.Text.cardDigestCounts(dDelta).where(col("c") > 1).count() == 0)
  }
}
