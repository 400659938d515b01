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
}
