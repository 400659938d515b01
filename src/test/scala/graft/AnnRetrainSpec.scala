package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Ann

/** C8i/C8j — the incremental-index LIFECYCLE policy:
  *   - the retrain trigger stays quiet on real same-distribution splits
  *     (the driver gate proves that at every scale; here at two),
  *   - and FIRES on planted distribution shifts — one control per
  *     violation class, so each threshold is proven live, not just
  *     never-tripped (IncrementalIvfSpec's negative-control discipline);
  *   - compaction folds deltas into the base with identical probe
  *     results and a layout that stopped growing.
  */
class AnnRetrainSpec extends SparkSpec {

  private val SkewBp = 2000L
  private val DistMarginMicro = 150000L

  test("real-split delta stays under the retrain thresholds (sf0.001 + sf0.01)") {
    for (d <- Seq(sf("sf0.001"), sf("sf0.01"))) {
      val got = SparkEntry.queries("inv_ann_retrain_trigger")(spark, d).collect()
      assert(got.isEmpty, s"$d tripped: ${got.mkString("; ")}")
    }
  }

  test("negative control: a single-cell delta trips cell_skew") {
    val corpus = Ann.embsWithNorm(spark, sf()).where(col("vec_id") >= Ann.NQ)
    val idx = Ann.ivfBuild(corpus.where(pmod(col("vec_id"), lit(5)) =!= 0), k = 8)
    val baseStats = Ann.ivfCellStats(spark, idx.cents, idx.assigned)
    // everything the ingest appended landed in ONE (the hottest) cell —
    // a new hot topic the frozen quantizer has no resolution for
    val hot = baseStats.maxBy(_._2)._1
    val delta = Ann.ivfAssign(idx.cents,
        corpus.where(pmod(col("vec_id"), lit(5)) === 0))
      .where(col("cell") === hot)
    val v = Ann.retrainViolations(spark, baseStats,
      Ann.ivfCellStats(spark, idx.cents, delta), SkewBp, DistMarginMicro).collect()
    assert(v.nonEmpty, "single-cell delta must trip the skew threshold")
    assert(v.forall(_.getString(0) == "cell_skew"), v.mkString("; "))
  }

  test("negative control: a shifted delta trips assign_dist") {
    val corpus = Ann.embsWithNorm(spark, sf()).where(col("vec_id") >= Ann.NQ)
    val idx = Ann.ivfBuild(corpus.where(pmod(col("vec_id"), lit(5)) =!= 0), k = 8)
    val baseStats = Ann.ivfCellStats(spark, idx.cents, idx.assigned)
    // the appended vectors land in a region the quantizer has NO
    // resolution for: a direction orthogonal to the ENTIRE centroid
    // span (the "new encoder version" failure — embeddings from a space
    // the index never trained on). Mild decorrelations (reversal,
    // negation) are NOT far enough: any fixed direction still reads
    // max-cos ≈ 0.2 against 8 spread centroids, inside the measured
    // out-of-sample gap — orthogonal-to-span is the honest shift.
    val d = idx.cents(0).length
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val basis = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    for (c <- idx.cents) {
      val v = c.clone()
      for (b <- basis; p = dot(v, b); i <- 0 until d) v(i) -= p * b(i)
      val n = math.sqrt(dot(v, v))
      if (n > 1e-9) basis += v.map(_ / n)
    }
    val e0 = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    for (b <- basis; p = dot(e0, b); i <- 0 until d) e0(i) -= p * b(i)
    val n0 = math.sqrt(dot(e0, e0))
    assert(n0 > 0.5, s"e0 unexpectedly inside the centroid span (residual $n0)")
    val ortho = e0.map(_ / n0)
    val shifted = corpus.where(pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id"),
        transform(array(ortho.map(lit).toIndexedSeq: _*), x => x * col("nrm")).as("emb"),
        col("nrm"))
    val dStats = Ann.ivfCellStats(spark, idx.cents, Ann.ivfAssign(idx.cents, shifted))
    val v = Ann.retrainViolations(spark, baseStats, dStats, SkewBp, DistMarginMicro).collect()
    def mean(st: Seq[(Int, Long, Long)]) = st.map(_._3).sum / math.max(st.map(_._2).sum, 1L)
    assert(v.exists(_.getString(0) == "assign_dist"),
      s"shifted delta must trip assign_dist (base mean ${mean(baseStats)}µ, " +
        s"delta mean ${mean(dStats)}µ): ${v.mkString("; ")}")
  }

  test("compaction folds deltas, probes identically, and the layout stops growing") {
    val root = Files.createTempDirectory("graft-compact-spec")
    Ann.buildIncrArtifactAt(spark, sf(), root)
    val cents = Ann.loadCents(root)
    val queries = Ann.embsWithNorm(spark, sf()).where(col("vec_id") < Ann.NQ)
    def probe(): Seq[(Long, Int, Long)] = Ann
      .ivfProbe(spark, Ann.IvfIndex(cents, Ann.readIncrAssigned(spark, root)),
        queries, p = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    def dataFiles(): Long = {
      val walk = Files.walk(root)
      try walk.filter(_.getFileName.toString.endsWith(".parquet"))
        .filter(Files.isRegularFile(_)).count()
      finally walk.close()
    }
    val pre = probe()
    val filesPre = dataFiles()
    Ann.ivfCompact(spark, root)
    assert(probe() == pre, "probe results must survive the fold unchanged")
    assert(!Files.isDirectory(root.resolve("deltas")), "deltas must be folded away")
    assert(dataFiles() <= filesPre,
      "compaction must not grow the file count the probe lists")
    // idempotent: a second compact on an already-folded index is a no-op
    Ann.ivfCompact(spark, root)
    assert(probe() == pre)
    org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("negative control: an orthogonal delta trips the PQ recon-error trigger") {
    val corpus = Ann.embsWithNorm(spark, sf()).where(col("vec_id") >= Ann.NQ)
    val base = corpus.where(pmod(col("vec_id"), lit(5)) =!= 0)
    val idx = Ann.pqBuild(base, k = 256, m = 16)
    val (bn, bs) = Ann.pqQuantErrStats(spark, idx.codebooks, base)
    // same orthogonal-to-trained-span model as the IVF control: the
    // frozen codebooks reconstruct nothing of it, so per-subspace
    // residuals stay ~full-length
    val d = 64
    val e0 = Array.tabulate(d)(i => if (i == 0 || i == 17 || i == 33 || i == 49) 0.5 else 0.0)
    val shifted = corpus.where(pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id"),
        transform(array(e0.map(lit).toIndexedSeq: _*), x => x * col("nrm")).as("emb"),
        col("nrm"))
    val (dn, ds) = Ann.pqQuantErrStats(spark, idx.codebooks, shifted)
    val v = Ann.pqRetrainViolations(spark, bs / bn, ds / dn, 150000L).collect()
    assert(v.exists(_.getString(0) == "recon_err"),
      s"orthogonal delta must trip recon_err (base ${bs / bn}µ, delta ${ds / dn}µ)")
    // and the real same-distribution delta must NOT trip it
    val (rn, rs) = Ann.pqQuantErrStats(spark, idx.codebooks,
      corpus.where(pmod(col("vec_id"), lit(5)) === 0))
    assert(Ann.pqRetrainViolations(spark, bs / bn, rs / rn, 150000L).collect().isEmpty,
      s"real delta tripped: base ${bs / bn}µ, delta ${rs / rn}µ")
  }

  test("full lifecycle: append batches, trigger stays quiet, compact, probe parity") {
    val root = Files.createTempDirectory("graft-lifecycle-spec")
    val corpus = Ann.embsWithNorm(spark, sf()).where(col("vec_id") >= Ann.NQ)
    // base = everything the two ingest batches below do NOT carry, so
    // append+compact coverage audits can demand exactly-once
    val idx = Ann.ivfBuild(corpus.where(!pmod(col("vec_id"), lit(7)).isin(1, 2)), k = 8)
    idx.assigned.write.partitionBy("cell")
      .parquet(root.resolve("assigned.parquet").toString)
    Files.writeString(root.resolve("cents.txt"),
      idx.cents.map(_.mkString(",")).mkString("\n"))
    Files.writeString(root.resolve("stats.txt"),
      Ann.ivfCellStats(spark, idx.cents,
          spark.read.parquet(root.resolve("assigned.parquet").toString))
        .sortBy(_._1).map { case (c, n, sd) => s"$c,$n,$sd" }.mkString("\n"))
    val cents = Ann.loadCents(root)
    // two ingest batches append through the frozen quantizer
    Ann.ivfAppend(spark, root, corpus.where(pmod(col("vec_id"), lit(7)) === 1))
    Ann.ivfAppend(spark, root, corpus.where(pmod(col("vec_id"), lit(7)) === 2))
    assert(Files.list(root.resolve("deltas")).count() == 2)
    // same-distribution appends must not trip the retrain trigger
    val delta = Ann.readDeltas(spark, root).get
    val v = Ann.retrainViolations(spark, Ann.loadStats(root),
      Ann.ivfCellStats(spark, cents, delta), SkewBp, DistMarginMicro).collect()
    assert(v.isEmpty, v.mkString("; "))
    val queries = Ann.embsWithNorm(spark, sf()).where(col("vec_id") < Ann.NQ)
    def probe(): Seq[(Long, Int, Long)] = Ann
      .ivfProbe(spark, Ann.IvfIndex(cents, Ann.readIncrAssigned(spark, root)),
        queries, p = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val pre = probe()
    Ann.ivfCompact(spark, root)
    assert(probe() == pre, "compaction after real appends must not move the top-k")
    // no vector lost or duplicated across append+compact
    val ids = Ann.readIncrAssigned(spark, root).select(col("n_id"))
    assert(ids.distinct().count() == ids.count())
    assert(ids.count() == corpus.count(), "append+compact must cover the corpus exactly")
    org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("interrupted compaction recovers: every crash window serves exactly-once") {
    import java.nio.file.StandardCopyOption.ATOMIC_MOVE
    def freshRoot(): java.nio.file.Path = {
      val r = Files.createTempDirectory("graft-crash-spec")
      Ann.buildIncrArtifactAt(spark, sf(), r)
      r
    }
    def servedIds(root: java.nio.file.Path): Seq[Long] =
      Ann.readIncrAssigned(spark, root).select(col("n_id"))
        .collect().map(_.getLong(0)).toSeq.sorted
    val expected = { // the healthy pre-crash view, exactly-once
      val r = freshRoot()
      val ids = servedIds(r)
      assert(ids == ids.distinct, "fixture itself must be exactly-once")
      org.apache.commons.io.FileUtils.deleteQuietly(r.toFile)
      ids
    }
    // window 1: crash after the merged rewrite, before any rename —
    // base+deltas stay live; the stale tmp must not confuse anything
    locally {
      val r = freshRoot()
      Ann.readIncrAssigned(spark, r).write.partitionBy("cell")
        .parquet(r.resolve(".assigned.compact-tmp").toString)
      assert(servedIds(r) == expected, "window-1 recovery changed the view")
      assert(!Files.exists(r.resolve(".assigned.compact-tmp")))
      org.apache.commons.io.FileUtils.deleteQuietly(r.toFile)
    }
    // window 2: crash BETWEEN the two renames — no live base at all;
    // recovery must roll the complete tmp forward
    locally {
      val r = freshRoot()
      Ann.readIncrAssigned(spark, r).write.partitionBy("cell")
        .parquet(r.resolve(".assigned.compact-tmp").toString)
      Files.move(r.resolve("assigned.parquet"), r.resolve(".assigned.old"), ATOMIC_MOVE)
      assert(servedIds(r) == expected, "window-2 recovery lost or doubled vectors")
      assert(!Files.isDirectory(r.resolve("deltas")), "deltas must fold away with the tmp")
      assert(!Files.exists(r.resolve(".assigned.old")))
      org.apache.commons.io.FileUtils.deleteQuietly(r.toFile)
    }
    // window 3: crash after the base swap, before cleanup — the r10
    // advice hazard: base already CONTAINS the deltas, so serving
    // deltas again would double every appended vector
    locally {
      val r = freshRoot()
      Ann.readIncrAssigned(spark, r).write.partitionBy("cell")
        .parquet(r.resolve(".assigned.compact-tmp").toString)
      Files.move(r.resolve("assigned.parquet"), r.resolve(".assigned.old"), ATOMIC_MOVE)
      Files.move(r.resolve(".assigned.compact-tmp"), r.resolve("assigned.parquet"), ATOMIC_MOVE)
      assert(servedIds(r) == expected, "window-3 recovery served appended vectors twice")
      assert(!Files.isDirectory(r.resolve("deltas")))
      assert(!Files.exists(r.resolve(".assigned.old")))
      // and a compact after recovery works normally (idempotent heal)
      Ann.ivfCompact(spark, r)
      assert(servedIds(r) == expected)
      org.apache.commons.io.FileUtils.deleteQuietly(r.toFile)
    }
  }

  test("append indices never collide after sparse delta names") {
    val root = Files.createTempDirectory("graft-sparse-spec")
    Ann.buildIncrArtifactAt(spark, sf(), root) // ships deltas/d0.parquet
    val corpus = Ann.embsWithNorm(spark, sf()).where(col("vec_id") >= Ann.NQ)
    Ann.ivfAppend(spark, root, corpus.where(pmod(col("vec_id"), lit(11)) === 1))
    // out-of-band removal makes the name sequence sparse: a directory
    // COUNT would now re-derive an index that collides with d0001
    org.apache.commons.io.FileUtils.deleteQuietly(
      root.resolve("deltas").resolve("d0.parquet").toFile)
    val before = Ann.readDeltas(spark, root).get.count()
    Ann.ivfAppend(spark, root, corpus.where(pmod(col("vec_id"), lit(11)) === 2))
    val names = {
      val st = Files.list(root.resolve("deltas"))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString).toList.sorted
      } finally st.close()
    }
    assert(names.count(_.endsWith(".parquet")) == 2, names.mkString(","))
    assert(Ann.readDeltas(spark, root).get.count() > before,
      "the second append must land as a NEW delta, not replace d0001")
    org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("tiny or empty deltas never fire cell_skew (granularity guard)") {
    val corpus = Ann.embsWithNorm(spark, sf()).where(col("vec_id") >= Ann.NQ)
    val idx = Ann.ivfBuild(corpus.where(pmod(col("vec_id"), lit(5)) =!= 0), k = 8)
    val baseStats = Ann.ivfCellStats(spark, idx.cents, idx.assigned)
    // ONE appended vector: its cell reads 10000 bp of "share" — the
    // r10 advice false-fire; the guard must keep the trigger quiet
    val one = Ann.ivfCellStats(spark, idx.cents,
      Ann.ivfAssign(idx.cents, corpus.where(col("vec_id") === Ann.NQ)))
    val vOne = Ann.retrainViolations(spark, baseStats, one, SkewBp, DistMarginMicro)
      .collect().filter(_.getString(0) == "cell_skew")
    assert(vOne.isEmpty, s"1-row delta fired cell_skew: ${vOne.mkString("; ")}")
    // EMPTY delta: every build cell's own share would read as drift
    val vEmpty = Ann.retrainViolations(spark, baseStats, Seq.empty,
      SkewBp, DistMarginMicro).collect().filter(_.getString(0) == "cell_skew")
    assert(vEmpty.isEmpty, s"empty delta fired cell_skew: ${vEmpty.mkString("; ")}")
  }
}
