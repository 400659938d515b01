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

  test("snapshot pinning: a frame constructed before a re-index commit " +
      "reads the OLD generation WITHOUT retry") {
    // r12 (r11 verdict #3): the real read-during-overwrite case. The
    // commit used to be a dynamic partition overwrite that deleted the
    // pinned frame's files in place; with the manifest discipline the
    // new generation lands beside the old one and the old frame's
    // explicit file list stays fully readable — a PLAIN collect (no
    // boundedCollect retry) must succeed and serve the pinned snapshot.
    val dir = Files.createTempDirectory("graft-pin-arch")
    def write(name: String, v: Long): Unit = {
      val p = dir.resolve(name)
      Files.write(p, s"""{"k":"a","v":$v}""".getBytes("UTF-8"))
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5))
    }
    write("f.json", 1L)
    val g = db()
    g.define("pin", ViewDef("/*.json",
      MapFn((v, _) => Seq(OverwriteRaceSpec.parseV(v) -> OverwriteRaceSpec.parseV(v)))))
    val arch = new DirArchive("dat://pin-origin", dir.toString)
    g.index(arch)
    val pinned = g.list("pin") // resolves the manifest NOW — generation 1
    write("f.json", 2L) // changed content, mtime forced forward
    g.index(arch) // generation-2 commit: old files must survive it
    val rows = pinned.collect() // no retry wrapper anywhere
    assert(rows.map(_.getString(1)).toSeq == Seq("1"),
      "pinned frame must serve the generation it resolved")
    val fresh = g.list("pin").collect()
    assert(fresh.map(_.getString(1)).toSeq == Seq("2"),
      "a frame constructed after the commit must serve the new generation")
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

object OverwriteRaceSpec extends Serializable {
  // map lambdas must not capture the (non-serializable) suite instance
  def parseV(value: String): Any =
    core.Json.parse(value).asInstanceOf[Map[String, Any]]("v")
}
