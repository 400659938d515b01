package graft

import org.apache.spark.sql.functions._

import graft.queries.Embed

/** C40/C40b/C41 — covariance sufficient statistics, PCA, int8
  * quantization. Load-bearing checks: hand-computed moments on a tiny
  * frame; an INDEPENDENT naive recomputation of the full sufficient-
  * statistic matrix from collected embeddings at sf0.001; a PCA fit on
  * a constructed diagonal-covariance corpus with known eigenpairs; the
  * Rayleigh/orthonormality gate returning zero violations on real data;
  * and quantization hand-cases incl. both saturation ends.
  */
class EmbedSpec extends SparkSpec {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def qFrame(rows: Seq[(Long, Seq[Long])]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("q", ArrayType(LongType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, q) => Row(id, q) }: _*), schema)
  }

  test("C40 moments: hand-computed sufficient statistics on 3 vectors") {
    // m-vectors (already kilo-scale): (1,2), (3,5), (-2,0)
    val out = Embed.moments(qFrame(Seq(
        0L -> Seq(1L, 2L), 1L -> Seq(3L, 5L), 2L -> Seq(-2L, 0L))))
      .orderBy("d1", "d2").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // sd0 = 1+3-2 = 2; sd1 = 2+5+0 = 7
    // sprod(0,0) = 1+9+4 = 14; sprod(0,1) = 2+15+0 = 17; sprod(1,1) = 4+25 = 29
    assert(out.toSeq == Seq(
      (0, 0, 14L, 2L, 2L, 3L),
      (0, 1, 17L, 2L, 7L, 3L),
      (1, 1, 29L, 7L, 7L, 3L)))
  }

  test("C40 moments == independent naive recomputation at sf0.001") {
    val raw = graft.core.Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1000).toLong).toArray)
    val d = raw.head._2.length
    val n = raw.length.toLong
    val sd = Array.tabulate(d)(i => raw.iterator.map(_._2(i)).sum)
    val naive = (for (i <- 0 until d; j <- i until d) yield {
      val sp = raw.iterator.map(x => x._2(i) * x._2(j)).sum
      (i, j, sp, sd(i), sd(j), n)
    }).toSeq
    val got = Embed.moments(Embed.quantized(spark, sf()))
      .orderBy("d1", "d2").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length == d * (d + 1) / 2)
    assert(got.toSeq == naive)
  }

  test("C40b pcaFit: known eigenpairs on a constructed corpus") {
    // 4 points in 2-d, zero mean: (1000,0), (-1000,0), (0,2000), (0,-2000)
    // → population cov diag(0.5, 2.0) in original (float) units
    val m = Embed.pcaFit(Embed.moments(qFrame(Seq(
      0L -> Seq(1000L, 0L), 1L -> Seq(-1000L, 0L),
      2L -> Seq(0L, 2000L), 3L -> Seq(0L, -2000L)))), 2)
    assert(math.abs(m.eigenvalues(0) - 2.0) < 1e-9)
    assert(math.abs(m.eigenvalues(1) - 0.5) < 1e-9)
    // descending order; deterministic positive sign
    assert(math.abs(m.basis(0)(1) - 1.0) < 1e-9 && math.abs(m.basis(0)(0)) < 1e-9)
    assert(math.abs(m.basis(1)(0) - 1.0) < 1e-9 && math.abs(m.basis(1)(1)) < 1e-9)
    assert(math.abs(m.mean(0)) < 1e-12 && math.abs(m.mean(1)) < 1e-12)
  }

  test("C40b jacobiEigen: reconstructs A = V diag(λ) Vᵀ on a dense symmetric matrix") {
    val a = Array(
      Array(4.0, 1.0, -2.0),
      Array(1.0, 3.0, 0.5),
      Array(-2.0, 0.5, 5.0))
    val (evals, evecs) = Embed.jacobiEigen(a)
    // eigen-equation residual ‖Av − λv‖ ≈ 0 per pair
    for (k <- 0 until 3) {
      val v = evecs(k)
      for (i <- 0 until 3) {
        val av = (0 until 3).map(j => a(i)(j) * v(j)).sum
        assert(math.abs(av - evals(k) * v(i)) < 1e-9, s"pair $k row $i")
      }
    }
    // trace preserved
    assert(math.abs(evals.sum - 12.0) < 1e-9)
  }

  test("C40b projection variance matches eigenvalues on real data (p=8)") {
    val m = Embed.pcaFit(spark, sf(), 8)
    // eigenvalues descending and positive
    assert(m.eigenvalues.toSeq == m.eigenvalues.sorted(Ordering[Double].reverse).toSeq)
    assert(m.eigenvalues.forall(_ > 0))
    val proj = Embed.pcaProject(spark, Embed.quantized(spark, sf()), m).collect()
    val n = proj.length.toDouble
    for (j <- 0 until 8) {
      val xs = proj.map(_.getDouble(1 + j))
      val mean = xs.sum / n
      val v = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(v - m.eigenvalues(j)) < 1e-6 * m.eigenvalues(j) + 1e-9,
        s"component $j: var $v vs λ ${m.eigenvalues(j)}")
      assert(math.abs(mean) < 1e-9, s"component $j mean $mean")
    }
  }

  test("inv_pca_variance: zero violations at sf0.001") {
    assert(SparkEntry.queries("inv_pca_variance")(spark, sf()).count() == 0)
  }

  test("D25 emb_pca_stream: bitwise parity with batch at sf0.001") {
    assert(SparkEntry.queries("inv_pca_stream_parity")(spark, sf()).count() == 0)
    val st = SparkEntry.queries("emb_pca_stream")(spark, sf())
    assert(st.count() > 0 && st.columns.head == "vec_id")
  }

  test("C40c emb_pca_project_int: integer direction tracks the float " +
      "top eigenvector; projection matches the closed form") {
    // the arm must gate PCA, not just a self-consistent integer fold:
    // the power-iteration direction and pcaFit's basis(0) must align
    val moment = Embed.moments(Embed.quantized(spark, sf())).collect()
    val (v, sd, n) = Embed.pcaIntPower(moment)
    val m = Embed.pcaFit(spark, sf(), 1)
    val b0 = m.basis(0)
    assert(v.length == b0.length)
    val dot = v.indices.foldLeft(0.0)((a, i) => a + v(i) * b0(i))
    val nv = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
    val cos = math.abs(dot) / nv // b0 is unit-norm
    assert(cos > 0.99, s"integer direction diverged from eigenbasis: cos=$cos")
    assert(v.map(math.abs).max == 1024L, "renormalization invariant broken")
    // projection: spot-check pc0 = n·⟨m,v⟩ − ⟨sd,v⟩ on a collected row
    val svdot = v.indices.foldLeft(0L)((a, i) => a + sd(i) * v(i))
    val q0 = Embed.quantized(spark, sf()).orderBy(col("vec_id")).first()
    val m0 = q0.getSeq[Long](1)
    val want = n * v.indices.foldLeft(0L)((a, i) => a + m0(i) * v(i)) - svdot
    val got = SparkEntry.queries("emb_pca_project_int")(spark, sf())
      .orderBy(col("vec_id")).first()
    assert(got.getLong(0) == q0.getLong(0) && got.getLong(1) == want)
  }

  test("C41 emb_quantize: hand cases incl. saturation ends") {
    // m=-1000 → code 0 → recon -1000, err 0
    // m= 1000 → code 255 → recon 1000, err 0
    // m=    0 → code 127 → recon 127·2000//255 − 1000 = 996 − 1000, err 4
    // code_chk (1-based): 0·1 + 255·2 + 127·3 = 891
    val got = Embed.quantizeStats(qFrame(Seq(0L -> Seq(-1000L, 1000L, 0L))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 4L, 4L, 891L)))
    // and through the registered query on real data: the double-floor
    // quantizer's worst case is err < step + 1 with step = 2000/255 ≈
    // 7.84 (code floor loses < step, recon floor < 1 more) → |err| ≤ 8
    val real = SparkEntry.queries("emb_quantize")(spark, sf()).collect()
    assert(real.nonEmpty)
    assert(real.forall(_.getLong(2) <= 8), "per-dim |err| exceeds int8 step bound")
  }
}
