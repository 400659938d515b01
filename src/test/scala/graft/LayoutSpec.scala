package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Z-order layout (SURVEY §2.E): prove the row-group pruning claim on
  * REAL parquet footers, not on plan strings — min/max statistics are
  * what a 100 TB scan actually skips by.
  */
class LayoutSpec extends SparkSpec {

  /** Row groups of all parquet files under `dir` whose (x, y) min/max
    * stats overlap the given box — exactly the reader's stats test.
    */
  private def overlapping(
      dir: String, xLo: Long, xHi: Long, yLo: Long, yHi: Long): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    var total = 0
    var overlap = 0
    files.foreach { f =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        conf, f, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      footer.getBlocks.asScala.foreach { b =>
        total += 1
        def range(name: String): (Long, Long) = {
          val s = b.getColumns.asScala
            .find(_.getPath.toDotString == name).get.getStatistics
          (s.genericGetMin.asInstanceOf[Number].longValue,
            s.genericGetMax.asInstanceOf[Number].longValue)
        }
        val (xmin, xmax) = range("x")
        val (ymin, ymax) = range("y")
        if (xmax >= xLo && xmin <= xHi && ymax >= yLo && ymin <= yHi)
          overlap += 1
      }
    }
    (overlap, total)
  }

  test("z-order: a y-slab predicate prunes row groups where the x-sorted layout cannot") {
    import spark.implicits._
    // two independent uniform columns — the natural (x-sorted) layout
    // leaves every row group spanning y's full range
    val n = 200000
    val df = spark.range(n).select(
      pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).as("x"),
      pmod(xxhash64(col("id"), lit(2)), lit(1000000L)).as("y"))
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    // small row groups so both layouts produce many stat units
    val prev = spark.sparkContext.hadoopConfiguration.get("parquet.block.size")
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 64 * 1024)
    try {
      df.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
        .write.parquet(s"$tmp/natural")
      graft.functions.Layout.zorderBy(df, Seq("x", "y"), partitions = 8)
        .write.parquet(s"$tmp/zorder")
    } finally {
      if (prev == null)
        spark.sparkContext.hadoopConfiguration.unset("parquet.block.size")
      else spark.sparkContext.hadoopConfiguration.set("parquet.block.size", prev)
    }
    // content preserved exactly — except() is set-semantics, so pin row
    // MULTIPLICITY with the count too
    assert(spark.read.parquet(s"$tmp/zorder").count() == n)
    assert(spark.read.parquet(s"$tmp/zorder").except(df).isEmpty &&
      df.except(spark.read.parquet(s"$tmp/zorder")).isEmpty)
    // a 2%-of-range y-slab, x unconstrained
    val (yLo, yHi) = (500000L, 520000L)
    val (natHit, natTotal) = overlapping(s"$tmp/natural", 0L, 1000000L, yLo, yHi)
    val (zHit, zTotal) = overlapping(s"$tmp/zorder", 0L, 1000000L, yLo, yHi)
    info(s"y-slab overlap: natural $natHit/$natTotal row groups, z-order $zHit/$zTotal")
    assert(natTotal >= 8 && zTotal >= 8, "too few row groups for the comparison to mean anything")
    // x-sorted layout: every row group spans all of y -> ~everything overlaps
    assert(natHit.toDouble / natTotal >= 0.9,
      s"expected the x-sorted layout to be unprunable on y ($natHit/$natTotal)")
    // z-order: row groups cover boxes -> most skip a 2% y-slab
    assert(zHit.toDouble / zTotal <= 0.5,
      s"z-order should prune most row groups for a narrow y-slab ($zHit/$zTotal)")
    // and the interleave must not have ruined x-pruning either: a 2% x-slab
    val (zxHit, _) = overlapping(s"$tmp/zorder", 500000L, 520000L, 0L, 1000000L)
    assert(zxHit.toDouble / zTotal <= 0.5,
      s"z-order should still prune on x too ($zxHit/$zTotal)")
  }

  test("zorderBy rejects non-numeric and missing columns with a type error naming them") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("n", "s")
    val e1 = intercept[IllegalArgumentException](
      graft.functions.Layout.zorderBy(df, Seq("n", "s")))
    assert(e1.getMessage.contains("requires numeric") && e1.getMessage.contains("'s'"),
      s"got: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException](
      graft.functions.Layout.zorderBy(df, Seq("nope")))
    assert(e2.getMessage.contains("does not exist"), s"got: ${e2.getMessage}")
  }

  test("zorderBy edge contracts: user _z column survives; empty/all-null and bad bits rejected") {
    import spark.implicits._
    val d = Seq((1L, 2L, "keep"), (3L, 4L, "it")).toDF("x", "y", "_z")
    val out = graft.functions.Layout.zorderBy(d, Seq("x", "y"))
    assert(out.columns.toSeq == Seq("x", "y", "_z"), s"lost a user column: ${out.columns.toSeq}")
    assert(out.select("_z").collect().map(_.getString(0)).toSet == Set("keep", "it"))
    intercept[IllegalArgumentException] {
      graft.functions.Layout.zorderBy(d, Seq("x"), bits = 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.Layout.zorderBy(
        spark.emptyDataFrame.select(lit(1L).as("x")).where(lit(false)), Seq("x"))
    }
    // partial knownRanges must be honored, not discarded: supplying x's
    // bounds and omitting y's still works (y computed from data)
    val mixed = graft.functions.Layout.zorderBy(
      d, Seq("x", "y"), knownRanges = Map("x" -> (0.0, 10.0)))
    assert(mixed.count() == 2)
  }
}
