package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    // same env contract as Bench/Verify
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 10 replicated origins x 5000 docs = 50k files across 10 partitions
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val state = java.nio.file.Files.createTempDirectory("graft-scale").toString
    val db = new Graft(spark, state)
    db.define("by-lang-size", ViewDef(Seq("/*.json"), MapDF { files =>
      val parsed = files.withColumn("j", from_json(col("value"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))))
      GraftFunctions.emitEntry(parsed, Seq(col("j.lang"), col("j.n_chars"), col("j.doc_id")), col("j.n_chars"))
    }, None))
    db.define("lang-count", ViewDef(Seq("/*.json"), MapDF { files =>
      val parsed = files.withColumn("j", from_json(col("value"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))))
      GraftFunctions.emitEntry(parsed, Seq(col("j.lang")), lit(1))
    }, Some(Reduce.Count)))
    val t0 = System.nanoTime()
    (0 until 10).foreach { o =>
      val body = to_json(struct((col("doc_id") + o * 5000).as("doc_id"), col("lang"), col("n_chars")))
      db.index(new TableArchive(s"dat://origin-$o",
        docs.select(body.as("b"), col("doc_id")),
        pathname = concat(lit("/"), lpad(col("doc_id").cast("string"), 8, "0"), lit(".json")),
        value = col("b")))
    }
    val tIndex = (System.nanoTime() - t0) / 1e9
    // incremental: bump 1% of one origin's rows to fversion 2 — the
    // re-index must reprocess ~50 files, not 50 000 (partition-local
    // merge keyed on fversion)
    val tInc0 = System.nanoTime()
    val body0 = to_json(struct(col("doc_id").as("doc_id"), col("lang"), col("n_chars")))
    db.index(new TableArchive("dat://origin-0",
      docs.select(body0.as("b"), col("doc_id")),
      pathname = concat(lit("/"), lpad(col("doc_id").cast("string"), 8, "0"), lit(".json")),
      value = col("b"),
      fversion = when(col("doc_id") % 100 === 0, lit(2L)).otherwise(lit(1L))))
    val tInc = (System.nanoTime() - tInc0) / 1e9
    val t1 = System.nanoTime()
    val n = db.list("by-lang-size", ListOpts(gte = Some(Seq("en", 200L)), lt = Some(Seq("fr")), limit = Some(1000))).count()
    val tList = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val counts = db.list("lang-count").count()
    val tRed = (System.nanoTime() - t2) / 1e9
    println(f"[scale] indexed 50000 files x 2 views in $tIndex%.1f s (${100000 / tIndex}%.0f entries/s)")
    println(f"[scale] incremental re-index (1%% of origin-0 changed) in $tInc%.1f s")
    println(f"[scale] range list limit=1000 -> $n rows in $tList%.2f s; reduced list -> $counts keys in $tRed%.2f s")
    spark.stop()
  }
}
