package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame

import graft.core._

/** The read-vs-commit story in both eras. Since r12 the PRIMARY defense
  * is snapshot pinning ([[Graft.entries]]/`_manifest.txt`): a frame
  * resolves an explicit file list at construction and a commit landing
  * mid-query cannot delete the files under it — the pinning specs below
  * prove that with PLAIN collects, plus the bounded-two-generations and
  * legacy-upgrade invariants of the manifest layer.
  *
  * [[Graft.boundedCollect]]'s retry remains as defense in depth for the
  * two tails pinning doesn't cover (a frame held across TWO commits of
  * one origin; legacy pre-manifest dirs reading whole-dir) — before
  * r12 it was the ONLY defense, and the 1M-file ScaleSmoke hit the
  * `FAILED_READ_FILE.FILE_NOT_EXIST` race with every origin already
  * converged. That window is sub-second and scheduler-dependent, so
  * the retry specs inject the failure instead: a by-name frame whose
  * first evaluations throw the two observed shapes (raw
  * FileNotFoundException cause chain; error-classed FILE_NOT_EXIST
  * message with a null-message link in the chain), then yield the
  * real frame.
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

  test("snapshot commits keep a bounded TWO generations per origin — " +
      "state does not grow across ticks") {
    // at 100 TB a watch tick every few seconds must not accumulate
    // file generations: commit N deletes generation N−2, so steady
    // state is current + grace, nothing more
    val dir = Files.createTempDirectory("graft-gen-arch")
    def write(v: Long): Unit = {
      val p = dir.resolve("f.json")
      Files.write(p, s"""{"k":"a","v":$v}""".getBytes("UTF-8"))
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5))
    }
    write(1L)
    val g = db()
    g.define("gen", ViewDef("/*.json",
      MapFn((v, _) => Seq(OverwriteRaceSpec.parseV(v) -> OverwriteRaceSpec.parseV(v)))))
    val arch = new DirArchive("dat://gen-origin", dir.toString)
    g.index(arch)
    val obDir = java.nio.file.Paths.get(
      g.stateRoot, "gen", "entries").toFile.listFiles()
      .filter(_.getName.startsWith("ob=")).head.toPath
    def dataFiles(): Int = {
      val s = Files.list(obDir)
      try s.iterator().asScala.count { p =>
        val n = p.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      } finally s.close()
    }
    (2L to 6L).foreach { v => write(v); g.index(arch) }
    assert(dataFiles() <= 2,
      s"expected current + grace generations only, found ${dataFiles()} files")
    // and the served read is the latest value
    assert(g.list("gen").collect().map(_.getString(1)).toSeq == Seq("6"))
  }

  test("a legacy pre-manifest state dir reads whole-dir and upgrades in " +
      "place on its next commit") {
    val dir = Files.createTempDirectory("graft-legacy-arch")
    def write(name: String, k: String, v: Long): Unit = {
      val p = dir.resolve(name)
      Files.write(p, s"""{"k":"$k","v":$v}""".getBytes("UTF-8"))
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5))
    }
    write("a.json", "a", 1L)
    val g = db()
    g.define("leg", ViewDef("/*.json",
      MapFn((v, _) => Seq(OverwriteRaceSpec.parseV(v) -> OverwriteRaceSpec.parseV(v)))))
    val arch = new DirArchive("dat://leg-origin", dir.toString)
    g.index(arch)
    val entriesDir = java.nio.file.Paths.get(g.stateRoot, "leg", "entries")
    // simulate state written by a pre-manifest build
    Files.delete(entriesDir.resolve("_manifest.txt"))
    assert(g.list("leg").collect().map(_.getString(1)).toSeq == Seq("1"),
      "legacy fallback must read the whole dir")
    // next commit bootstraps: the pre-existing file becomes the grace
    // generation (NOT its own deletion target — the r12 ordering bug)
    write("b.json", "b", 2L)
    g.index(arch)
    assert(Files.exists(entriesDir.resolve("_manifest.txt")),
      "a commit into a legacy dir must adopt it")
    assert(g.list("leg").collect().map(_.getString(1)).toSeq == Seq("1", "2"))
  }

  test("compact() retires unindexed origins: grace files reclaimed, manifest row dropped, stale staging swept") {
    val root = Files.createTempDirectory("graft-retire")
    def mkArch(i: Int): DirArchive = {
      val d = root.resolve(s"a$i")
      Files.createDirectories(d)
      Files.write(d.resolve("doc.json"), s"""{"v":$i}""".getBytes("UTF-8"))
      new DirArchive(s"dat://retire-$i", d.toString)
    }
    val g = new Graft(spark, root.resolve("state").toString)
    g.define("rv", ViewDef("/doc.json",
      MapFn((v, m) => Seq(m.origin -> OverwriteRaceSpec.parseV(v)))))
    g.index(mkArch(0)); g.index(mkArch(1))
    val dir = java.nio.file.Paths.get(g.stateRoot, "rv", "entries").toString
    g.unindex("dat://retire-1")
    // the retraction commit leaves the origin's last generation as grace
    // (empty current) — no later commit ever targets a removed origin
    val m1 = g.loadManifest(dir).get
    val retired = m1.collect { case (ob, (cur, grace)) if cur.isEmpty => (ob, grace) }
    assert(retired.size == 1 && retired.head._2.nonEmpty,
      "unindex must leave the last generation pinned as grace")
    val graceFiles = retired.head._2.map(f => java.nio.file.Paths.get(dir, f))
    assert(graceFiles.forall(Files.exists(_)))
    // plus a crashed commit's staging leftovers
    val stale = java.nio.file.Paths.get(dir, ".staging-deadbeef")
    Files.createDirectories(stale)
    Files.write(stale.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    g.compact("rv")
    val m2 = g.loadManifest(dir).get
    assert(!m2.contains(retired.head._1), "retired origin's manifest row must be dropped")
    assert(graceFiles.forall(f => !Files.exists(f)), "retired grace generation must be reclaimed")
    assert(!Files.exists(stale), "crashed-commit staging dir must be swept")
    assert(g.getValue("rv", "dat://retire-0").isDefined, "survivor origin still served")
    assert(g.getValue("rv", "dat://retire-1").isEmpty)
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
