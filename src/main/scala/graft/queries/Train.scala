package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distributed classifier TRAINING — SURVEY.md §2.C31c: the missing
  * third of the classifier story (C31 scores with in-kernel weights,
  * C31b serves a stored weights table — C31c PRODUCES one). The task is
  * heuristic DISTILLATION, a real curation-pipeline pattern (CCNet
  * trains wiki-vs-crawl; production pipelines routinely distill an
  * expensive rule stack into a cheap linear model): learn to imitate
  * C10's rule-based quality filter (label = quality_bp ≥ 5000, the
  * pipeline_curate cutoff) from hashed bag-of-words features alone.
  *
  * Optimizer: full-batch gradient descent on logistic loss over
  * Z-SCORED count features — the classic aggregated-gradient shape
  * ([[Cluster]]'s k-means / [[Embed]]'s PCA split, applied to a model):
  *   - ONE corpus scan builds the persisted (doc_id, bucket, c) count
  *     table and per-doc labels; feature moments (mean/std per bucket)
  *     come from one pass over it;
  *   - per iteration, scoring is a broadcast join of the bounded
  *     weights table (≤ occupied buckets ≤ vocabulary — the C31b
  *     broadcastability argument) + one map-side-combinable per-doc
  *     aggregation; the gradient is one groupBy(bucket) over the
  *     residual-joined counts — the shuffle carries ≤ occupied-bucket
  *     partial rows, never documents;
  *   - the driver folds the exact dense gradient from the sparse
  *     aggregates: z-scoring makes absent features contribute
  *     −μ_b/σ_b·Σr, a rank-one term recovered from the global residual
  *     sum, so sparsity never biases the math.
  *
  * Float iterates aren't hash-gateable (the [[Tokenizer]] unigram
  * stance): the encode query is rows-only and
  * `inv_classifier_distill_accuracy` drives the training-accuracy
  * floor through the driver gate; ClassifierTrainSpec replays the
  * whole optimization densely on the driver and pins weight-level
  * agreement.
  */
object Train {

  private val Iters = 20
  private val Lr = 2.0
  /** Driver-gate floor for distillation accuracy (measured 0.948 at
    * sf0.01, 0.922 at sf0.1 — margin absorbs data regeneration).
    */
  private val AccFloorBp = 8500L

  private val words = split(col("text"), " ")

  /** Per-occurrence hashed token counts: (doc_id, bucket, c). */
  private[graft] def bucketCounts(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        explode(graft.functions.Kernels.tokenBuckets(words)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("c"))

  /** Distillation labels: y = 1 iff C10's quality_bp ≥ 5000 (the
    * pipeline_curate cutoff) — the teacher rule the model imitates.
    */
  private[graft] def distillLabels(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        size(words).as("n_words"),
        size(array_distinct(words)).as("n_distinct"),
        size(filter(words, t => t.isin("the", "a", "of", "and", "to"))).as("n_stop"))
      .select(col("doc_id"),
        when((least(col("n_words"), lit(100)) * 40
          + expr("(least(n_stop * 10, n_words) * 3000) div n_words")
          + expr("(n_distinct * 3000) div n_words")) >= 5000, lit(1.0d))
          .otherwise(lit(0.0d)).as("y"))

  /** A trained linear model over z-scored hashed-count features. */
  final case class LinearModel(
      weights: Map[Long, Double], // per occupied bucket, z-space
      bias: Double,
      mu: Map[Long, Double],
      sd: Map[Long, Double],
      losses: Seq[Double])

  /** Full-batch logistic GD. `cnts` = (doc_id, bucket, c) PERSISTED by
    * the caller (it is read 2·iters + 2 times); `labels` = (doc_id, y).
    * Driver state is bounded by occupied buckets; every corpus-sized
    * pass is one aggregation.
    */
  def logisticTrain(cnts: DataFrame, labels: DataFrame,
      iters: Int = Iters, lr: Double = Lr): LinearModel = {
    val n = labels.count().toDouble
    require(n > 0, "logisticTrain: empty corpus")
    val momRows = cnts.groupBy(col("bucket"))
      .agg(sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"))
      .collect()
    val mu = momRows.map(r => r.getLong(0) -> r.getDouble(1) / n).toMap
    val sd = momRows.map { r =>
      val m = r.getDouble(1) / n
      val v = r.getDouble(2) / n - m * m
      r.getLong(0) -> (if (v > 0) math.sqrt(v) else 1.0)
    }.toMap
    val s = cnts.sparkSession
    var w = mu.keys.map(_ -> 0.0).toMap
    var bias = 0.0
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to iters) {
      val resid = residuals(s, cnts, labels, w, bias, mu, sd)
        .localCheckpoint(true)
      try {
        val g = resid.agg(sum(col("r")).as("sr"), sum(col("loss")).as("sl")).head
        val (sr, sl) = (g.getDouble(0), g.getDouble(1))
        losses += sl / n
        val grad = cnts.join(resid.select(col("doc_id"), col("r")), Seq("doc_id"))
          .groupBy(col("bucket")).agg(sum(col("c") * col("r")).as("g"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        w = w.map { case (b, wb) =>
          val gz = (grad.getOrElse(b, 0.0) - mu(b) * sr) / (sd(b) * n)
          b -> (wb - lr * gz)
        }
        bias -= lr * sr / n
      } finally resid.unpersist(blocking = false)
    }
    LinearModel(w, bias, mu, sd, losses.toSeq)
  }

  /** Per-doc (doc_id, y, p, r, loss) under the given parameters. The
    * z-space score decomposes sparsely: Σ_b w_b·z_db =
    * Σ_{b∈doc} (w_b/σ_b)·c_db − Σ_b w_b·μ_b/σ_b (the constant K).
    */
  private def residuals(s: SparkSession, cnts: DataFrame, labels: DataFrame,
      w: Map[Long, Double], bias: Double,
      mu: Map[Long, Double], sd: Map[Long, Double]): DataFrame = {
    val k = w.iterator.map { case (b, wb) => wb * mu(b) / sd(b) }.sum
    val wsd = w.toSeq.map { case (b, wb) => (b, wb / sd(b)) }
    val wdf = s.createDataFrame(wsd).toDF("bucket", "wsd")
    cnts.join(broadcast(wdf), Seq("bucket"))
      .groupBy(col("doc_id")).agg(sum(col("c") * col("wsd")).as("raw"))
      .join(labels, Seq("doc_id"))
      .select(col("doc_id"), col("y"),
        (lit(1.0d) / (lit(1.0d) + exp(-(col("raw") + lit(bias - k))))).as("p"))
      .select(col("doc_id"), col("y"), col("p"),
        (col("p") - col("y")).as("r"),
        (-(col("y") * log(col("p") + lit(1e-12))
          + (lit(1.0d) - col("y")) * log(lit(1.0d) - col("p") + lit(1e-12)))).as("loss"))
  }

  /** Score a corpus with a trained model → (doc_id, label, pred). */
  def predict(s: SparkSession, cnts: DataFrame, labels: DataFrame,
      m: LinearModel): DataFrame =
    residuals(s, cnts, labels, m.weights, m.bias, m.mu, m.sd)
      .select(col("doc_id"), col("y").cast("long").as("label"),
        when(col("p") >= 0.5, lit(1L)).otherwise(lit(0L)).as("pred"))

  private def trained(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    // NOT unpersisted: the returned plan reads it lazily (the
    // bpeEncodeDocs stance); the inv gate wraps with releasing()
    val cnts = bucketCounts(d).localCheckpoint(true)
    val labels = distillLabels(d).localCheckpoint(true)
    predict(s, cnts, labels, logisticTrain(cnts, labels))
  }

  val all: Seq[Q] = Seq(

    // C31c: the trained model's per-doc decisions. Rows-only (float
    // GD); inv_classifier_distill_accuracy floors the training
    // accuracy, ClassifierTrainSpec pins dense-replay agreement.
    Q.noOracle("text_quality_classifier_train") { (s, dir) =>
      trained(s, dir).orderBy(col("doc_id"))
    },

    // The distillation must actually imitate its teacher: training
    // accuracy ≥ AccFloorBp (violations WHERE 1=0). A broken gradient,
    // a broken z-score fold, or a broken scoring join all land here.
    Q("inv_classifier_distill_accuracy",
      """SELECT CAST(NULL AS BIGINT) AS acc_bp FROM documents WHERE 1=0""") { (s, dir) =>
      trained(s, dir)
        .agg((sum(when(col("label") === col("pred"), 1L).otherwise(0L)) * 10000L).as("h"),
          count(lit(1)).as("n"))
        .select(expr("h div n").as("acc_bp"))
        .where(col("acc_bp") < AccFloorBp)
    })
}
