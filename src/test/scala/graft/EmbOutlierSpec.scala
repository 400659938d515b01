package graft

import org.apache.spark.sql.functions._

/** C53 `emb_outlier` — hand-computed centroid-cosine outlier decisions
  * (both outlier branches), label isolation, and the broadcast-centroid
  * plan contract.
  */
class EmbOutlierSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("C72 centroid drift: hand-computed scaled L1 shift between snapshots") {
    import spark.implicits._
    val dir = "target/tmp/embdrift"
    // label 0: vec 0 lives in both snapshots, vec 2 (%7=2) in v0 only ->
    // S0=(1000,1000)/n0=2 vs S1=(1000,0)/n1=1: L1 = |2000-1000|+|0-1000|
    // = 2000, div (2*1) = 1000. label 1: identical membership -> 0.
    Seq((0L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.0f, 1.0f), 0),
        (1L, Seq(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("emb_centroid_drift")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 2L, 1L, 1000L), (1L, 1L, 1L, 0L)))
  }

  test("C53 hand-computed: dot<0 branch, cos<0.05 branch, keep") {
    // label 0, m = floor(v*1000): [1000,0], [0,1000], [-1000,-100]
    //   S = [0, 900], ss = 810000
    //   v0: dot = 0      -> 400*0 < 1e6*810000 -> outlier (cos = 0)
    //   v1: dot = 900000 -> cos = 1 -> keep
    //   v2: dot = -90000 -> negative-dot branch -> outlier
    val out = graft.queries.Embed.embOutlier(frame(Seq(
        (0L, Seq(1.0f, 0.0f), 0),
        (1L, Seq(0.0f, 1.0f), 0),
        (2L, Seq(-1.0f, -0.1f), 0))))
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.toSeq == Seq((0L, 1), (1L, 0), (2L, 1)))
  }

  test("C53 centroids are per-LABEL: an identical vector flips verdict with its label") {
    // [0,1] sits at label 0's centroid (keep) but orthogonal-to-negative
    // of label 1's ([1,0]-dominated) centroid (outlier)
    val out = graft.queries.Embed.embOutlier(frame(Seq(
        (0L, Seq(0.0f, 1.0f), 0), (1L, Seq(0.0f, 1.0f), 0),
        (2L, Seq(1.0f, 0.0f), 1), (3L, Seq(1.0f, 0.0f), 1),
        (4L, Seq(0.0f, 1.0f), 1)))) // same vector, other label
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    // label-1 centroid S = [2000, 1000]: v4 dot = 1e6,
    // 400·1e12 vs 1e6·5e6 = 5e12 -> 4e14 >= 5e12? no: 400·(1e6)² = 4e14
    // >= 5e12 -> NOT outlier (cos = 1000/ (1000·sqrt(5e6)/1000)...)
    // cos(v4, S) = 1e6 / (1000 · 2236.07) = 0.447 > 0.05 -> keep too.
    // The flip needs a centroid pointing AWAY: relabel with [-1,0] mass.
    assert(out.toSeq == Seq((0L, 0), (1L, 0), (2L, 0), (3L, 0), (4L, 0)))
  }

  test("C53 opposing centroid makes the same vector an outlier") {
    val out = graft.queries.Embed.embOutlier(frame(Seq(
        (0L, Seq(0.0f, 1.0f), 0), (1L, Seq(0.0f, 1.0f), 0),
        (2L, Seq(0.0f, -1.0f), 1), (3L, Seq(0.0f, -1.0f), 1),
        (4L, Seq(0.0f, 1.0f), 1)))) // against label 1's [0,-1] mass
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    // label-1 S = [0, -1000]: v4 dot = -1e6 < 0 -> outlier;
    // v2/v3 dot = (-1000)·(-1000) = 1e6, cos = 1 -> keep
    assert(out.toSeq == Seq((0L, 0), (1L, 0), (2L, 0), (3L, 0), (4L, 1)))
  }

  test("D17 stream twin emits exactly the batch rows (frozen-centroid parity)") {
    val batch = SparkEntry.queries("emb_outlier")(spark, sf()).collect().toSeq
    val stream = SparkEntry.queries("emb_outlier_stream")(spark, sf()).collect().toSeq
    assert(stream == batch)
  }

  test("C53 plan: centroid broadcasts back; the corpus never sort-merges") {
    val df = SparkEntry.queries("emb_outlier")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded per-label centroid table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-side merge join:\n$p")
  }
}
