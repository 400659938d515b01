package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // steady-state measurement: touch every table once so JVM/codegen/
    // file-listing warm-up doesn't land on whichever query runs first
    graft.core.Tables.names.foreach { t =>
      try {
        (if (t == "events") graft.core.Tables.events(spark, sfDir)
         else graft.core.Tables(spark, sfDir, t)).count()
      } catch { case _: Throwable => }
    }
    // declaration order (deterministic), not Map hash order — timings of
    // shared-state queries (view_*) stay attributable run to run
    // a crashing query must NOT bench as "fast": record it as -1 s (an
    // impossible time) and surface the failure on stderr + an errors list
    val results = SparkEntry.allQ.map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.run(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAIL ${q.name}: ${e.getMessage}")
            false
        }
      (q.name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(n => "\"" + n._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
