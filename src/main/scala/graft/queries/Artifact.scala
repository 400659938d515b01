package graft.queries

import org.apache.spark.sql.SparkSession

/** Persisted-artifact plumbing shared by the index/tokenizer probe
  * paths (C8g ann_*_probe, r9 tokenizer artifacts): fingerprint a
  * source table so a stale artifact can never serve a regenerated
  * corpus, and publish artifact directories atomically so concurrent
  * sessions can't observe (or interleave into) a half-written one.
  */
private[graft] object Artifact {

  /** Fingerprint of a parquet-backed source table. Resolved through the
    * Hadoop FileSystem API — correct for any scheme the session can
    * read, not just local files (r8 advice: `java.io.File` silently
    * returned 0 bytes for non-local paths). The key folds row count,
    * total byte length, AND max file modification time: a regenerated
    * corpus that collides on (n, bytes) still moves mtime, so the probe
    * path rebuilds instead of serving the stale index.
    */
  def corpusKey(s: SparkSession, dir: String, table: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    var bytes = 0L
    var mtime = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val st = it.next()
      bytes += st.getLen
      mtime = math.max(mtime, st.getModificationTime)
    }
    val n = graft.core.Tables(s, dir, table).count()
    s"v2_n${n}_b${bytes}_m$mtime"
  }

  /** Publish `dest` atomically: `write` fills a fresh temp sibling
    * directory, which renames into place as the LAST step (an atomic
    * move on the same filesystem). Readers therefore only ever see a
    * complete artifact or none; of racing writers, one rename wins and
    * the losers clean up their temp — no marker file can point at a
    * partially rewritten directory (r8 advice on ivf/pqArtifact).
    * No-op when `dest` already exists.
    */
  def publish(dest: java.nio.file.Path)(write: java.nio.file.Path => Unit): Unit = {
    if (java.nio.file.Files.exists(dest)) return
    java.nio.file.Files.createDirectories(dest.getParent)
    val tmp = dest.getParent.resolve(
      s".${dest.getFileName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    java.nio.file.Files.createDirectories(tmp)
    try {
      write(tmp)
      try java.nio.file.Files.move(tmp, dest,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        // a concurrent publisher won the rename: their complete
        // artifact serves; ours deletes below
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: java.nio.file.FileSystemException
          if java.nio.file.Files.exists(dest) => ()
      }
    } finally deleteRecursively(tmp)
  }

  private[queries] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
}
