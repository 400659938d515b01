package graft

import org.apache.spark.sql.functions._

import graft.queries.Ann

/** C8e incremental IVF maintenance — the negative controls behind
  * `inv_ann_ivf_incremental`'s 0-violation contract: the gate must
  * actually FIRE on each failure class it claims to cover.
  */
class IncrementalIvfSpec extends SparkSpec {

  private def parts(dir: String) = {
    val e = Ann.embsWithNorm(spark, dir)
    val corpus = e.where(col("vec_id") >= Ann.NQ)
    val base = corpus.where(pmod(col("vec_id"), lit(5)) =!= 0)
    val delta = corpus.where(pmod(col("vec_id"), lit(5)) === 0)
    (e, corpus, base, delta)
  }

  test("a wrong-cell delta append changes probe results (topk parity is not vacuous)") {
    val dir = sf("sf0.001")
    val (e, corpus, base, delta) = parts(dir)
    val idx = Ann.ivfBuild(base, k = 8)
    val queries = e.where(col("vec_id") < Ann.NQ)
    def probe(a: org.apache.spark.sql.DataFrame) =
      Ann.ivfProbe(spark, Ann.IvfIndex(idx.cents, a), queries, p = 4)
        .select(col("q_id"), col("n_id"))
    val good = idx.assigned.unionAll(Ann.ivfAssign(idx.cents, delta))
    // corrupt: every delta vector lands one cell over — the bookkeeping
    // bug class an append path can actually have
    val bad = idx.assigned.unionAll(
      Ann.ivfAssign(idx.cents, delta)
        .withColumn("cell", pmod(col("cell") + 1, lit(8)).cast("int")))
    val full = probe(Ann.ivfAssign(idx.cents, corpus)).collect().toSet
    assert(probe(good).collect().toSet == full, "correct append must probe identically")
    assert(probe(bad).collect().toSet != full, "wrong-cell append must be visible to the probe")
  }

  test("C8f: a delta encoded with RETRAINED codebooks is visible to the PQ probe") {
    // the freeze contract: append must reuse the base codebooks — a
    // delta encoded by codebooks trained on the delta itself produces
    // codes the base LUTs mis-score
    val dir = sf("sf0.001")
    val (e, corpus, base, delta) = parts(dir)
    val idx = Ann.pqBuild(base, m = 16, k = 16)
    val queries = e.where(col("vec_id") < Ann.NQ)
    def probe(enc: org.apache.spark.sql.DataFrame) =
      Ann.pqProbe(spark, Ann.PqIndex(idx.codebooks, enc,
          corpus.select(col("vec_id").as("n_id"), col("emb"), col("nrm"))),
        queries, rerank = 5)
        .select(col("q_id"), col("n_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val good = probe(idx.encoded.unionAll(Ann.pqEncode(idx.codebooks, delta)))
    val full = probe(Ann.pqEncode(idx.codebooks, corpus))
    assert(good == full, "frozen-codebook append must probe identically")
    val retrained = Ann.pqBuild(delta, m = 16, k = 16)
    val bad = probe(idx.encoded.unionAll(retrained.encoded))
    assert(bad != full, "a retrained-codebook append must be visible to the probe")
  }

  test("dropped and duplicated delta rows are caught by the coverage audits") {
    val dir = sf("sf0.001")
    val (_, corpus, base, delta) = parts(dir)
    val idx = Ann.ivfBuild(base, k = 8)
    val assignedDelta = Ann.ivfAssign(idx.cents, delta)
    val lostOne = idx.assigned.unionAll(
      assignedDelta.where(col("n_id") =!= assignedDelta.select(min(col("n_id"))).head.getLong(0)))
    val dupOne = idx.assigned.unionAll(assignedDelta).unionAll(assignedDelta.limit(1))
    val corpusIds = corpus.select(col("vec_id").as("n_id"))
    assert(corpusIds.join(lostOne.select(col("n_id")), Seq("n_id"), "left_anti").count() == 1L)
    assert(dupOne.groupBy(col("n_id")).agg(count(lit(1)).as("c"))
      .where(col("c") =!= 1).count() == 1L)
  }
}
