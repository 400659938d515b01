package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `dir`. Reads are plain
  * `spark.read.parquet` so Catalyst handles filter/column pushdown; callers
  * never cache here — each query declares its own plan end-to-end.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two physical layouts across driver data
    * generations: parquet TIMESTAMP(NANOS) — which vanilla Spark rejects
    * ([PARQUET_TYPE_ILLEGAL]), so it reads as raw nanos under the
    * `nanosAsLong` legacy conf — and plain TIMESTAMP(MICROS) without UTC
    * adjustment, which Spark reads natively as TIMESTAMP_NTZ.
    * [[normalizeTs]] rebuilds either into the same microsecond
    * TimestampType column the queries were written against — lossless
    * for everything they do (hour buckets, ordering, windowing).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize a frame's `ts` to microsecond TimestampType, whatever the
    * parquet layout delivered (works on streaming frames too — it only
    * inspects the schema). Long nanos convert with integer `div`, not
    * `/`: nanos exceed double's 2^53 mantissa, so the double division
    * path rounds the low microsecond digit and diverges from the
    * oracle's exact ns→us truncation. NTZ casts to session-zone
    * timestamps; every gate/spec session pins UTC, so the epoch micros
    * are bit-identical to the old nanos-derived column.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
