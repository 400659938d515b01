package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One JVM-wide session (getOrCreate)
  * keeps the suite fast; each spec builds its plans from scratch.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  // the session is JVM-wide: release any checkpointed slivers queries
  // pinned during this suite so they don't accumulate across suites
  override def afterAll(): Unit = {
    graft.queries.Pinned.drain()
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    // collected java.sql.Timestamp values render via the JVM default
    // zone; specs compare their toString against UTC literals, so pin it
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
