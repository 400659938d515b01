package graft

import java.nio.file.Files

import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame

import graft.core._

/** Deterministic coverage for the driver-read-vs-merge-overwrite retry
  * ([[Graft.boundedCollect]]): a `getValue`/`listEntries` collect that
  * races a watch-merge's dynamic partition overwrite sees
  * `FAILED_READ_FILE.FILE_NOT_EXIST` (file listed, then replaced by the
  * commit). The collect takes its frame BY-NAME and rebuilds it on that
  * failure class — the 1M-file ScaleSmoke hit exactly this with every
  * origin already converged.
  *
  * The race window itself is sub-second and scheduler-dependent, so the
  * specs inject the failure instead: a by-name frame whose first
  * evaluations throw the two observed shapes (raw FileNotFoundException
  * cause chain; error-classed FILE_NOT_EXIST message with a null-message
  * link in the chain), then yield the real frame.
  */
class OverwriteRaceSpec extends SparkSpec {

  private def db(): Graft =
    new Graft(spark, Files.createTempDirectory("graft-race").toString)

  private def frame(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).toDF("v")
  }

  test("collect retries through a FileNotFoundException cause chain and returns the rebuilt frame") {
    val g = db()
    var calls = 0
    val rows = g.boundedCollect({
      calls += 1
      if (calls <= 2) throw new SparkException("stage failed",
        new java.io.FileNotFoundException("/state/entries/ob=x/part-0.parquet"))
      frame(3)
    }, "race-test", "race-test")
    assert(calls == 3)
    assert(rows.map(_.getInt(0)).sorted == Seq(1, 2, 3))
  }

  test("collect retries on an error-classed FILE_NOT_EXIST message, tolerating null messages in the chain") {
    val g = db()
    var calls = 0
    val rows = g.boundedCollect({
      calls += 1
      if (calls == 1) throw new SparkException(
        "[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error while reading file",
        new RuntimeException(null: String))
      frame(1)
    }, "race-test", "race-test")
    assert(calls == 2)
    assert(rows.map(_.getInt(0)) == Seq(1))
  }

  test("a persistent missing-file failure still surfaces after bounded retries") {
    val g = db()
    var calls = 0
    val ex = intercept[SparkException] {
      g.boundedCollect({
        calls += 1
        throw new SparkException("s",
          new java.io.FileNotFoundException("gone.parquet"))
      }, "race-test", "race-test")
    }
    assert(ex.getCause.isInstanceOf[java.io.FileNotFoundException])
    assert(calls == 6) // initial + 5 retries
  }

  test("unrelated failures are NOT retried") {
    val g = db()
    var calls = 0
    intercept[IllegalArgumentException] {
      g.boundedCollect({
        calls += 1
        throw new IllegalArgumentException("bad query")
      }, "race-test", "race-test")
    }
    assert(calls == 1)
  }
}
