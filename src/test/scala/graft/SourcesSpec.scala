package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources & sinks — SURVEY.md §2.E: parquet (primary), json, csv, text,
  * binaryFile readers with file-metadata columns; partitioned parquet
  * state with dynamic partition overwrite (the engine's incremental-
  * maintenance primitive).
  */
class SourcesSpec extends SparkSpec {

  private def write(p: Path, body: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
  }

  test("json/csv/text readers surface _metadata.file_path for origin derivation") {
    val root = Files.createTempDirectory("graft-sources")
    write(root.resolve("j/a.json"), """{"k":"x","v":1}""")
    write(root.resolve("c/a.csv"), "k,v\nx,1")
    write(root.resolve("t/a.txt"), "hello world")

    val j = spark.read.schema("k string, v long").json(root.resolve("j").toString)
      .select(col("k"), col("v"), col("_metadata.file_path").as("fp"))
      .head()
    assert(j.getString(0) == "x" && j.getLong(1) == 1L && j.getString(2).endsWith("a.json"))

    val c = spark.read.option("header", "true").schema("k string, v long")
      .csv(root.resolve("c").toString)
      .select(col("k"), col("v"), col("_metadata.file_path").as("fp"))
      .head()
    assert(c.getString(0) == "x" && c.getLong(1) == 1L && c.getString(2).endsWith("a.csv"))

    val t = spark.read.text(root.resolve("t").toString)
      .select(col("value"), col("_metadata.file_path").as("fp"))
      .head()
    assert(t.getString(0) == "hello world" && t.getString(1).endsWith("a.txt"))
  }

  test("binaryFile reader: content + metadata; metadata-only plans prune the content column") {
    val root = Files.createTempDirectory("graft-bin")
    write(root.resolve("x.bin"), "payload-bytes")

    val df = spark.read.format("binaryFile").load(root.toString)
    val full = df.select(col("path"), col("length"), col("content")).head()
    assert(new String(full.getAs[Array[Byte]]("content"), "UTF-8") == "payload-bytes")
    assert(full.getAs[Long]("length") == 13L)

    // change-detection plans (path+length only) must not read bytes
    val metaPlan = df.select(col("path"), col("length"))
      .queryExecution.executedPlan.toString
    val readSchema = metaPlan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("content"), s"content not pruned: $readSchema")
  }

  test("orc round-trip: alternative columnar sink/source for view state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    Seq((1L, "x", Array[Byte](1, 2)), (2L, "y", Array[Byte](3)))
      .toDF("id", "s", "b").write.orc(dir)
    val back = spark.read.orc(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2).toSeq))
    assert(back.toSeq == Seq((1L, "x", Seq[Byte](1, 2)), (2L, "y", Seq[Byte](3))))
  }

  test("avro round-trip: container files read distributed via AvroKeyInputFormat") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
    val dir = Files.createTempDirectory("graft-avro")
    val schema: Schema = SchemaBuilder.record("doc").fields()
      .requiredLong("id").requiredString("s").optionalDouble("d")
      .endRecord()
    def writeFile(name: String, rows: Seq[(Long, String, Option[Double])]): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, dir.resolve(name).toFile)
      rows.foreach { case (id, s, d) =>
        val b = new GenericRecordBuilder(schema).set("id", id).set("s", s)
        d.foreach(v => b.set("d", v))
        w.append(b.build()); ()
      }
      w.close()
    }
    // two container files — the directory-of-files lake layout
    writeFile("part-0.avro", Seq((1L, "x", Some(0.5)), (2L, "y", None)))
    writeFile("part-1.avro", Seq((3L, "z", Some(1.25))))
    val df = graft.core.Avro.read(spark, dir.toString,
      StructType(Seq(StructField("id", LongType), StructField("s", StringType),
        StructField("d", DoubleType))))
    val back = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(back.toSeq == Seq(
      (1L, "x", Some(0.5)), (2L, "y", None), (3L, "z", Some(1.25))))
    // DataFrame surface composes: ordinary codegen'd transforms downstream
    assert(df.where(col("d").isNotNull).agg(sum(col("id"))).head().getLong(0) == 4L)
  }

  test("dynamic partition overwrite rewrites only the partitions present in the batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpo").toString + "/t"
    Seq(("a", 1), ("b", 2)).toDF("p", "v").write.partitionBy("p").parquet(dir)

    // overwrite ONLY partition a; b must survive
    Seq(("a", 10)).toDF("p", "v").write
      .partitionBy("p")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dir)

    val rows = spark.read.parquet(dir).orderBy("p")
      .collect().map(r => (r.getAs[String]("p"), r.getAs[Int]("v"))).toSeq
    assert(rows == Seq(("a", 10), ("b", 2)))
  }

  test("partition pruning: an origin-filtered read scans only that origin's directory") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-prune").toString + "/t"
    Seq(("o1", 1), ("o2", 2), ("o3", 3)).toDF("ob", "v")
      .write.partitionBy("ob").parquet(dir)
    val plan = spark.read.parquet(dir).where(col("ob") === "o2")
      .queryExecution.executedPlan.toString
    // partition filter handled at planning: the data filter list must not
    // need ob, and only one partition dir is read
    assert(plan.contains("PartitionFilters") && plan.contains("ob"), plan)
    val n = spark.read.parquet(dir).where(col("ob") === "o2").count()
    assert(n == 1)
  }
}
