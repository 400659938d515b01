package graft

import org.apache.spark.sql.SparkSession

/** Plan-iteration harness: print a gated query's FINAL adaptive plan
  * (post-execution, so AQE's exchange reuse and join choices are the
  * ones that actually ran) plus the scan/reuse counts the PlanSpecs
  * assert on. Usage:
  *   sbt "runMain graft.Explain <queryName> [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    println(p)
    println("== documents scans: " + p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents")))
    println("== reused exchanges: " + p.linesIterator.count(_.contains("ReusedExchange")))
    println("== broadcast exchanges: " + p.linesIterator.count(_.contains("BroadcastExchange")))
    println("== shuffle exchanges: " + p.linesIterator.count(_.contains("Exchange hashpartitioning")))
    spark.stop()
  }
}
