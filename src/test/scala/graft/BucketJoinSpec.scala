package graft

/** F3 `layout_bucket_join` — the at-rest bucketed layout must make the
  * join run with NO hash-partitioning exchange: both scans come out of
  * the bucketed tables already clustered on the join key.
  */
class BucketJoinSpec extends SparkSpec {

  test("F3 plan: sort-merge join with zero hash exchanges under it") {
    val df = SparkEntry.queries("layout_bucket_join")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.contains("SortMergeJoin"), s"expected the co-located SMJ:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed layout must delete the join shuffle:\n$p")
    // the only allowed exchange is the presentation sort's range partition
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      s"the scans must actually be bucketed reads:\n$p")
  }

  test("F4 plan: the lang predicate prunes partitions, not rows") {
    val df = SparkEntry.queries("layout_partition_prune")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.contains("PartitionFilters: [isnotnull(lang") && p.contains("= en)"),
      s"the lang filter must land as a partition (directory) filter:\n$p")
    // nothing left to filter row-wise: the scan's data filters are empty
    assert(p.contains("PushedFilters: []"),
      s"no residual row filter expected on the pruned scan:\n$p")
  }

  test("F3 repeat runs reuse the session's bucketed tables") {
    val q = SparkEntry.queries("layout_bucket_join")
    val first = q(spark, sf()).collect()
    val again = q(spark, sf()).collect() // tableExists short-circuits the write
    assert(first.toSeq == again.toSeq && first.nonEmpty)
  }
}
