package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming CRASH-RECOVERY — the reference's resumable-index contract
  * (indexer.js:121 resumes from the last indexed version) at stream
  * grain: a production ingest pipeline restarts constantly, so every
  * stateful operator class must recover its checkpoint state and produce
  * the SAME final answer as an uninterrupted run.
  *
  * One case per stateful class in the D-suite:
  *   1. streaming aggregation           (D1 q20s shape, complete mode)
  *   2. mapGroupsWithState              (D15 domain-cap shape, update mode)
  *   3. flatMapGroupsWithState          (D21 tokenize-pack shape, append)
  *   4. stream-stream interval join     (D5 q28s shape, append)
  *
  * Protocol (same in all four): write HALF the input files, run the
  * query to completion (AvailableNow) against checkpoint C, stop; write
  * the remaining files; START A NEW QUERY on the SAME checkpoint; assert
  * the completed sink ≡ the answer over the FULL input. Each fixture is
  * built so the phase-2 output is WRONG unless phase-1 state actually
  * recovered (counts that must include unre-read rows, cap lists that
  * must retain earlier smaller ids, a pack buffer that must carry a
  * partial block across the restart, join state that must match
  * across the phase boundary) — the file-source offset log guarantees
  * phase-1 files are never re-read, so recovery is the only path to the
  * right answer.
  */
class StreamRecoverySpec extends SparkSpec {

  /** Single-FILE parquet (file streams glob file names; a Spark-written
    * DIRECTORY would be listed as its part files plus _SUCCESS noise —
    * real testdata ships single files, so fixtures do too).
    */
  private def writeParquetFile(dir: Path, name: String, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("graft-rec-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(dir)
    Files.copy(part, dir.resolve(name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  /** Run a streaming frame to completion (AvailableNow) and block. */
  private def runOnce(q: org.apache.spark.sql.streaming.DataStreamWriter[Row]): Unit = {
    val query = q.trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
  }

  test("recovery 1/4: streaming aggregation resumes its state store (complete mode)") {
    val in = Files.createTempDirectory("graft-rec1-in")
    val ckpt = Files.createTempDirectory("graft-rec1-ckpt")
    val sess = spark; import sess.implicits._

    val all = Seq(
      ("click", 1.0), ("click", 2.0), ("view", 5.0),   // phase 1
      ("click", 3.0), ("view", 4.0), ("buy", 7.0))     // phase 2
    val (p1, p2) = all.splitAt(3)
    writeParquetFile(in, "f1.parquet", p1.toDF("event_type", "value"))

    def agg = spark.readStream
      .schema("event_type STRING, value DOUBLE")
      .parquet(in.toString)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

    runOnce(agg.writeStream.format("memory").queryName("rec1_a")
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt.toString))
    // phase-1 sanity: partial counts present
    assert(spark.table("rec1_a").count() == 2)
    spark.catalog.dropTempView("rec1_a")

    writeParquetFile(in, "f2.parquet", p2.toDF("event_type", "value"))
    // restart on the SAME checkpoint: the offset log keeps f1 unread, so
    // click=2/view=1 can only come from the recovered state store
    runOnce(agg.writeStream.format("memory").queryName("rec1_b")
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt.toString))

    val got = spark.table("rec1_b").orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.dropTempView("rec1_b")
    assert(got == Seq(("buy", 1L, 7.0), ("click", 3L, 6.0), ("view", 2L, 9.0)))
  }

  test("recovery 2/4: mapGroupsWithState resumes bounded per-group state (update mode)") {
    val in = Files.createTempDirectory("graft-rec2-in")
    val ckpt = Files.createTempDirectory("graft-rec2-ckpt")
    val out = Files.createTempDirectory("graft-rec2-out")
    val sess = spark; import sess.implicits._
    val cap = 3

    // phase 1 carries the SMALL ids: the final cap-3 keep lists are
    // wrong unless the recovered state still holds them when phase 2's
    // larger ids arrive
    val p1 = Seq((1L, "a"), (2L, "a"), (10L, "b"), (11L, "b"))
    val p2 = Seq((3L, "a"), (4L, "a"), (5L, "a"), (12L, "b"), (13L, "b"))
    writeParquetFile(in, "f1.parquet", p1.toDF("doc_id", "domain"))

    def capped = spark.readStream
      .schema("doc_id BIGINT, domain STRING")
      .parquet(in.toString)
      .as[(Long, String)]
      .groupByKey(_._2)
      .mapGroupsWithState[Seq[Long], (String, Seq[Long])](GroupStateTimeout.NoTimeout) {
        (domain: String, rows: Iterator[(Long, String)], state: GroupState[Seq[Long]]) =>
          val next = (state.getOption.getOrElse(Seq.empty) ++ rows.map(_._1))
            .sorted.take(cap)
          state.update(next)
          (domain, next)
      }
      .toDF("domain", "keep")

    // update-mode memory sinks can't recover from a checkpoint; the
    // production pattern is foreachBatch → per-batch overwrite keyed by
    // batchId (idempotent on replay), which is what a real pipeline
    // would run — so that's what the spec runs
    def sink(df: DataFrame) = df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
        ()
      }

    runOnce(sink(capped))
    writeParquetFile(in, "f2.parquet", p2.toDF("doc_id", "domain"))
    runOnce(sink(capped))

    // final state per group = its LATEST emitted update
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain")).orderBy(col("batch").desc)
    val finalState = spark.read.parquet(out.toString)
      .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("domain"), col("keep"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap

    // both domains were touched in phase 2, so their latest update is
    // post-restart — it can only contain phase-1 ids via recovered state
    assert(finalState("a") == Seq(1L, 2L, 3L))
    assert(finalState("b") == Seq(10L, 11L, 12L))
  }

  test("recovery 3/4: flatMapGroupsWithState resumes a partial pack buffer (append mode)") {
    val in = Files.createTempDirectory("graft-rec3-in")
    val ckpt = Files.createTempDirectory("graft-rec3-ckpt")
    val out = Files.createTempDirectory("graft-rec3-out")
    val sess = spark; import sess.implicits._
    val block = 5 // ids per packed block
    val eos = 99L

    // one shard; token streams sized so a block straddles the restart:
    // phase 1 = doc 1 (3 ids + eos = 4 buffered, NO block emitted) —
    // phase 2's first block is wrong unless the 4-id buffer recovered
    val p1 = Seq((1L, Seq(11L, 12L, 13L)))
    val p2 = Seq((2L, Seq(21L, 22L)), (3L, Seq(31L, 32L, 33L, 34L)))
    writeParquetFile(in, "f1.parquet", p1.toDF("doc_id", "ids"))

    def packed = spark.readStream
      .schema("doc_id BIGINT, ids ARRAY<BIGINT>")
      .parquet(in.toString)
      .as[(Long, Seq[Long])]
      .groupByKey(_ => 0L)
      .flatMapGroupsWithState[(Long, Seq[Long]), (Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Seq[Long])], state: GroupState[(Long, Seq[Long])]) =>
          val (startBlock, startBuf) = state.getOption.getOrElse((0L, Seq.empty[Long]))
          var blockId = startBlock
          var buf = startBuf.toVector
          val emitted = Vector.newBuilder[(Long, String)]
          rows.toVector.sortBy(_._1).foreach { case (_, ids) =>
            buf = buf ++ ids :+ eos
            while (buf.length >= block) {
              val (b, rest) = buf.splitAt(block)
              emitted += ((blockId, b.mkString(",")))
              blockId += 1; buf = rest
            }
          }
          state.update((blockId, buf))
          emitted.result().iterator
      }
      .toDF("block", "ids")

    def sink(df: DataFrame) = df.writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Append)

    runOnce(sink(packed))
    // nothing emits in phase 1 — the whole buffer is in-flight state
    assert(spark.read.schema("block BIGINT, ids STRING").parquet(out.toString).count() == 0)

    writeParquetFile(in, "f2.parquet", p2.toDF("doc_id", "ids"))
    runOnce(sink(packed))

    val got = spark.read.parquet(out.toString)
      .orderBy("block").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // token stream: 11 12 13 99 | 21 22 99 | 31 32 33 34 99 → blocks of 5
    assert(got == Seq(
      (0L, "11,12,13,99,21"),
      (1L, "22,99,31,32,33")))
  }

  test("recovery 4/4: stream-stream interval join resumes its join state (append mode)") {
    val in = Files.createTempDirectory("graft-rec4-in")
    val ckpt = Files.createTempDirectory("graft-rec4-ckpt")
    val out = Files.createTempDirectory("graft-rec4-out")
    val sess = spark; import sess.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

    // phase 1 = clicks only; phase 2 = the purchases they precede. Every
    // output pair spans the restart: it exists only if the buffered
    // click state survived the stop
    val p1 = Seq(
      (101L, 1L, "click", ts(0)), (102L, 1L, "click", ts(10)),
      (103L, 2L, "click", ts(5)), (104L, 3L, "click", ts(20)))
    val p2 = Seq(
      (201L, 1L, "purchase", ts(30)),  // matches 101,102
      (202L, 2L, "purchase", ts(40)),  // matches 103
      (203L, 4L, "purchase", ts(45)))  // no clicks → no pair (inner)
    val cols = Seq("event_id", "user_id", "event_type", "ts")
    writeParquetFile(in, "f1.parquet", p1.toDF(cols: _*))

    def joined = {
      def src = spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP")
        .parquet(in.toString)
      val purchases = src.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val clicks = src.where(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"))
        .select(col("p_id"), col("c_id"))
    }

    def sink(df: DataFrame) = df.writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Append)

    runOnce(sink(joined))
    assert(spark.read.schema("p_id BIGINT, c_id BIGINT").parquet(out.toString).count() == 0)

    writeParquetFile(in, "f2.parquet", p2.toDF(cols: _*))
    runOnce(sink(joined))

    val got = spark.read.parquet(out.toString)
      .orderBy("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((201L, 101L), (201L, 102L), (202L, 103L)))
  }
}
