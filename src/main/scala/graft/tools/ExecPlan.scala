package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the EXECUTED plan (final AQE plan, post-run) for named queries to
  * plans/<tag>/<name>_<suffix>.txt — the companion of [[graft.Plans]]
  * (which dumps the pre-execution formatted plan). Needed where AQE
  * re-plans at runtime: checkpoint-scan inputs carry estimated stats, so
  * the initial plan can show SortMergeJoin where the executed plan is an
  * AQE-converted BroadcastHashJoin over the REAL table size (the
  * scale-adaptive join choice, guide §3.1). The query is EXECUTED via a
  * noop write (computes every column, guide §1.4).
  *
  *   runMain graft.tools.ExecPlan <sfDir> <outDir> <suffix> q1,q2,...
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: ExecPlan <sfDir> <outDir> <suffix> q1,q2,...")
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // collect() executes THIS df's QueryExecution (a noop write would
      // plan a separate one and leave this plan un-finalized); gate
      // results are bounded, so the driver fetch is trivial
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("\\+\\- == Initial Plan ==")(0)
      graft.queries.Pinned.drain()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"EXECPLAN WRITTEN $n (${plan.length} chars)")
    }
    spark.stop()
  }
}
