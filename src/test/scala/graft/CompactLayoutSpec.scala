package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.core._

/** compact() rewrites each origin partition CLUSTERED BY kb — proven on
  * real parquet footers, the LayoutSpec discipline applied to the view
  * state a `list` range read actually scans. Fresh indexing interleaves
  * key ranges across row groups (emit order follows files, not keys), so
  * a narrow kb range overlaps nearly every row group; after compaction
  * each row group covers a narrow kb slice and the same range prunes
  * almost everything. Contents must be byte-identical before/after.
  */
class CompactLayoutSpec extends SparkSpec {

  /** (overlapping, total) row groups among the files a reader is SERVED
    * from `dir` — the manifest's current generation (r12 snapshot
    * commits leave the grace generation on disk beside it; counting
    * those would measure garbage a scan never touches), or the whole
    * dir for legacy pre-manifest state — whose kb min/max range
    * intersects [lo, hi]: the reader's stats test,
    * unsigned-lexicographic like the BinaryType ordering kb is built
    * for.
    */
  private def kbOverlap(db: Graft, dir: String,
      lo: Array[Byte], hi: Array[Byte]): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    def allFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) allFiles(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
    val served = db.loadManifest(dir) match {
      case Some(m) => m.valuesIterator.flatMap(_._1)
        .map(rel => new org.apache.hadoop.fs.Path(s"$dir/$rel")).toSeq
      case None => allFiles(root)
    }
    var total = 0
    var overlap = 0
    served.foreach { f =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        conf, f, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      footer.getBlocks.asScala.foreach { b =>
        total += 1
        val s = b.getColumns.asScala.find(_.getPath.toDotString == "kb").get.getStatistics
        val kmin = s.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
        val kmax = s.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
        def le(a: Array[Byte], bb: Array[Byte]): Boolean =
          java.util.Arrays.compareUnsigned(a, bb) <= 0
        if (le(lo, kmax) && le(kmin, hi)) overlap += 1
      }
    }
    (overlap, total)
  }

  test("compact() kb-clusters origin partitions: a narrow kb range prunes row groups") {
    val nKeys = 20000
    val perFile = 500
    val d = Files.createTempDirectory("graft-compact-data")
    (0 until nKeys / perFile).foreach { i =>
      Files.write(d.resolve(s"f$i.json"), "{}".getBytes("UTF-8")); ()
    }
    // a fixed global shuffle assigns each file 500 scattered keys — emit
    // order (per file) is key-interleaved, like any real indexing pass
    val perm = new scala.util.Random(7).shuffle((0 until nKeys).toVector)
    val root = Files.createTempDirectory("graft-compact-state")
    val db = new Graft(spark, root.toString)
    db.define("v", ViewDef("/f*.json", MapFn((_, m) => {
      val fi = m.pathname.stripPrefix("/f").stripSuffix(".json").toInt
      (0 until perFile).map { j => (f"k${perm(fi * perFile + j)}%05d", 1) }
    })))
    val conf = spark.sparkContext.hadoopConfiguration
    val prev = conf.get("parquet.block.size")
    conf.setInt("parquet.block.size", 32 * 1024) // many row groups at spec scale
    try {
      db.index(new DirArchive("dat://compact", d.toString))
      val entriesDir = s"$root/v/entries"
      val lo = KeyCodec.encode(KeyCodec.asKey("k01000"))
      val hi = KeyCodec.encode(KeyCodec.asKey("k02000")) // 5% of the key space
      val opts = ListOpts(gte = Some(KeyCodec.asKey("k01000")),
        lt = Some(KeyCodec.asKey("k02000")))
      val before = db.list("v", opts).collect()
        .map(_.getAs[String]("key_json")).toVector
      val (preHit, preTotal) = kbOverlap(db, entriesDir, lo, hi)
      db.compact("v")
      val (postHit, postTotal) = kbOverlap(db, entriesDir, lo, hi)
      info(s"kb-slab overlap: fresh $preHit/$preTotal row groups, compacted $postHit/$postTotal")
      assert(preTotal >= 8 && postTotal >= 8,
        s"too few row groups for the comparison to mean anything ($preTotal/$postTotal)")
      assert(preHit.toDouble / preTotal >= 0.8,
        s"expected the fresh (file-ordered) layout to be unprunable ($preHit/$preTotal)")
      assert(postHit.toDouble / postTotal <= 0.3,
        s"compacted layout should prune most row groups for a 5% kb range ($postHit/$postTotal)")
      // contents and read results unchanged
      val after = db.list("v", opts).collect()
        .map(_.getAs[String]("key_json")).toVector
      assert(after == before && before.size == 1000,
        s"compaction must not change list() results (${before.size} -> ${after.size})")
    } finally {
      if (prev == null) conf.unset("parquet.block.size")
      else conf.set("parquet.block.size", prev)
    }
  }
}
