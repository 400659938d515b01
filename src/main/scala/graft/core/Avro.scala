package graft.core

import org.apache.avro.generic.GenericRecord
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source — the one common lake format the E-row
  * readers (parquet/orc/json/csv/text/binaryFile) didn't cover. This
  * classpath ships the Avro LIBRARY jars (avro, avro-mapred) but NOT
  * the spark-avro connector, so `spark.read.format("avro")` cannot
  * resolve; the distributed read is driven by avro-mapred's
  * `AvroKeyInputFormat` instead — Avro containers carry sync markers,
  * so the Hadoop split machinery parallelizes a large file exactly as
  * the connector would. Records project to Rows INSIDE each partition
  * (GenericRecord is not serializable and must never cross a stage
  * boundary), with the reader schema taken from each file's writer
  * schema — the container is self-describing.
  *
  * RDD use is justified here the way the media codecs justify
  * mapPartitions: the source boundary itself. Everything downstream is
  * an ordinary DataFrame in whole-stage codegen.
  */
object Avro {

  /** Read an Avro container file (or directory of them) into a
    * DataFrame with the given projected columns. Supported field
    * types: string, long, int, double, boolean, bytes — the Avro
    * primitives a lake table round-trips losslessly.
    */
  def read(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val fields: Seq[(String, DataType)] =
      schema.fields.toSeq.map(f => (f.name, f.dataType))
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable])
      .mapPartitions(_.map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(fields.map { case (name, dt) =>
          convert(rec.get(name), dt)
        })
      })
    spark.createDataFrame(rdd, schema)
  }

  private def convert(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: java.lang.CharSequence, StringType) => s.toString
    case (n: java.lang.Number, LongType) => n.longValue()
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (n: java.lang.Number, DoubleType) => n.doubleValue()
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (x, _) => x
  }
}
