package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-query options — the reference's `list(view, opts)`
  * (/root/reference/README.md, lib/view.js:67). Bounds are compound keys
  * (bare scalars accepted); `limit` counts KEYS for map views (the
  * reference limits the LevelDB key stream, then flattens multi-values).
  */
final case class ListOpts(
    gt: Option[Seq[Any]] = None,
    gte: Option[Seq[Any]] = None,
    lt: Option[Seq[Any]] = None,
    lte: Option[Seq[Any]] = None,
    limit: Option[Int] = None,
    reverse: Boolean = false)

/** One materialized view entry, driver-side. */
final case class Entry(key: Any, value: Any)

/** The engine: a Spark-native re-expression of DatArchiveMapReduce
  * (/root/reference/index.js). Views are defined over archives (file
  * collections); indexing materializes `(kb, key_json, file_url, seq,
  * value_json)` entry rows as parquet partitioned by origin; queries are
  * declarative DataFrame plans over that state.
  *
  * Scale design:
  *   - State is partitioned by origin (`ob=` dirs): (re-)indexing an
  *     origin is a partition-local dynamic overwrite — never a full
  *     table rewrite; origins index in parallel trivially.
  *   - `list` range bounds compile to BinaryType comparisons on `kb`
  *     that push into the parquet scan (row-group pruning via min/max).
  *   - Reduced views aggregate AT QUERY TIME with partial aggregation:
  *     the reference pre-folds into LevelDB because its reads are
  *     single-threaded point lookups; on Spark the fold is a shuffle-
  *     light `groupBy(kb)` over only the key range being read, which
  *     scales with executors instead of serializing on write.
  */
class Graft(val spark: SparkSession, val stateRoot: String) {

  private val views = mutable.LinkedHashMap.empty[String, ViewDef]
  // origin -> last indexed fversion (drives listIndexed/isIndexed)
  private val indexed = mutable.LinkedHashMap.empty[String, Long]
  // (origin, view) -> last indexed fversion. PER VIEW, matching the
  // reference's per-view archiveVersionLevel (view.js:39): a view defined
  // AFTER an origin was indexed starts at -1 and gets a full build on the
  // next index() while current views stay incremental.
  private val viewVersions = mutable.LinkedHashMap.empty[String, Long]
  private def vvKey(origin: String, view: String) = origin + "\n" + view

  loadCatalog()

  // --- definition ----------------------------------------------------

  /** `damr.define(name, definition)`. */
  def define(name: String, view: ViewDef): Unit = {
    require(!views.contains(name), s"$name has already been defined")
    views(name) = view
  }

  // --- indexing ------------------------------------------------------

  /** `damr.index(archive)` — full or incremental depending on what the
    * catalog says was already indexed for this origin.
    */
  def index(archive: Archive): Unit = {
    val filesNow = archive.files(spark)
    // Materialize the views CONCURRENTLY: each view's write is an
    // independent Spark job, and submitting them from separate driver
    // threads lets the scheduler interleave their stages (idle cores of
    // one job's tail run the next job's scan). Same pattern a cluster
    // deployment uses for independent output tables.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = Graft.indexPool
    val jobs = views.toSeq.map { case (name, view) => Future {
      val lastV = viewVersions.getOrElse(vvKey(archive.url, name), -1L)
      val matched = filesNow.filter(col("pathname").rlike(view.pathRegex))
      if (lastV < 0) {
        writeOriginPartition(name, archive.url, mapEntries(view, matched))
      } else {
        // Incremental: reprocess only files whose version advanced;
        // keep prior entries of unchanged files that still exist
        // (deleted files drop out — retraction, indexer.js:269).
        val changed = matched.filter(col("fversion") > lastV)
        val currentUrls = matched.select(col("url").as("cur_url"))
        val prior = entriesForOrigin(name, archive.url)
          .join(broadcast(currentUrls), col("file_url") === col("cur_url"), "left_semi")
          .join(broadcast(changed.select(col("url").as("chg_url"))),
            col("file_url") === col("chg_url"), "left_anti")
          .select(Graft.entrySchemaWithPartition.fieldNames.toIndexedSeq.map(col): _*)
        writeOriginPartition(name, archive.url,
          prior.unionByName(mapEntries(view, changed)), readsState = true)
      }
    } }
    jobs.foreach(Await.result(_, Duration.Inf))
    val v = math.max(archive.version(spark), 0L)
    indexed(archive.url) = v
    views.keys.foreach(name => viewVersions(vvKey(archive.url, name)) = v)
    saveCatalog()
  }

  /** `damr.unindex(archive)` — drop all state derived from the origin. */
  def unindex(origin: String): Unit = {
    views.keys.foreach { name =>
      deleteDir(s"${viewDir(name)}/ob=${escape(origin)}")
      viewVersions.remove(vvKey(origin, name))
    }
    indexed.remove(origin)
    saveCatalog()
  }

  /** `damr.indexFile(archive, pathname)` — single-file (re-)index; does
    * not touch the origin catalog (reference semantics).
    */
  def indexFile(archive: Archive, pathname: String): Unit = {
    val file = archive.files(spark).filter(col("pathname") === pathname)
    views.foreach { case (name, view) =>
      if (file.filter(col("pathname").rlike(view.pathRegex)).limit(1).count() > 0) {
        val fileUrl = archive.url + pathname
        val prior = entriesForOrigin(name, archive.url)
          .filter(col("file_url") =!= fileUrl)
        writeOriginPartition(name, archive.url,
          prior.unionByName(mapEntries(view, file)), readsState = true)
      }
    }
  }

  /** `damr.unindexFile` — retract one file's entries. */
  def unindexFile(origin: String, pathname: String): Unit = {
    val fileUrl = origin + pathname
    views.keys.foreach { name =>
      val prior = entriesForOrigin(name, origin).filter(col("file_url") =!= fileUrl)
      writeOriginPartition(name, origin, prior, readsState = true)
    }
  }

  /** Compact a view's state: rewrite each origin partition as one file.
    * Streaming maintenance (watch mode) appends a file per micro-batch;
    * compaction restores scan efficiency without changing contents — the
    * routine small-files pass of any streaming-ingest table. Runs as a
    * single dynamic partition overwrite clustered by origin.
    */
  def compact(view: String): Unit = {
    val dir = viewDir(view)
    if (Files.exists(Paths.get(dir))) {
      val rows = spark.read.schema(Graft.entrySchemaWithPartition).parquet(dir)
        .repartition(col("ob"))
      writeOriginPartition(view, origin = "", rows, readsState = true)
    }
  }

  /** `damr.reset(view)` — clear a view's materialized state (and its
    * per-origin index versions, so the next index() rebuilds it fully —
    * reference Indexer.resetIndex semantics).
    */
  def reset(view: String): Unit = {
    deleteDir(viewDir(view))
    viewVersions.filterInPlace { case (k, _) => !k.endsWith("\n" + view) }
    saveCatalog()
  }

  /** `damr.destroy()`. */
  def destroy(): Unit = {
    deleteDir(stateRoot)
    indexed.clear()
    viewVersions.clear()
  }

  /** Lifecycle mapping: the reference's `open()` is this constructor
    * (catalog load); `close()` releases no engine-held resources — state
    * is parquet on disk, the catalog is flushed on every mutation, and
    * the SparkSession belongs to the caller. Streaming queries from
    * [[watch]] are returned to the caller to stop.
    */
  def close(): Unit = ()

  def listIndexed(): Seq[String] = indexed.keys.toSeq
  def isIndexed(origin: String): Boolean = indexed.contains(origin)

  // --- queries -------------------------------------------------------

  /** Raw entry state of a view:
    * (kb, key_json, file_url, pathname, seq, value_json, ob).
    */
  def entries(view: String): DataFrame = {
    require(views.contains(view), s"$view is not defined")
    val dir = viewDir(view)
    if (!Files.exists(Paths.get(dir))) emptyEntries()
    else spark.read.schema(Graft.entrySchemaWithPartition).parquet(dir)
  }

  /** `damr.get(view, key)` as a DataFrame of (key_json, value_json):
    * one row per value for map views (ordered by emitting file then emit
    * seq, reference view.js:51), one row for reduced views.
    */
  def get(view: String, key: Any): DataFrame = {
    val kb = KeyCodec.encode(KeyCodec.asKey(key))
    val hit = entries(view).filter(col("kb") === lit(kb))
    views(view).reduce match {
      case Some(r) => reduceEntries(hit, r)
      case None =>
        hit.orderBy(col("file_url"), col("seq"))
          .select(col("key_json"), col("value_json"))
    }
  }

  /** Driver-side `get` returning parsed values (multi-value for map
    * views, the fold for reduced views) — the reference's return shape.
    */
  def getValue(view: String, key: Any): Option[Any] = {
    val rows = get(view, key).collect()
    if (rows.isEmpty) None
    else views(view).reduce match {
      case Some(_) => Some(Json.parse(rows(0).getAs[String]("value_json")))
      case None => Some(rows.map(r => Json.parse(r.getAs[String]("value_json"))).toVector)
    }
  }

  /** `damr.list(view, opts)` as a DataFrame of (key_json, value_json)
    * in range order (reversed if asked). The kb bounds push down to the
    * parquet scan.
    */
  def list(view: String, opts: ListOpts = ListOpts()): DataFrame = {
    var df = entries(view)
    opts.gt.foreach(k => df = df.filter(col("kb") > lit(KeyCodec.encode(k))))
    opts.gte.foreach(k => df = df.filter(col("kb") >= lit(KeyCodec.encode(k))))
    opts.lt.foreach(k => df = df.filter(col("kb") < lit(KeyCodec.encode(k))))
    opts.lte.foreach(k => df = df.filter(col("kb") <= lit(KeyCodec.encode(k))))

    val reduced = views(view).reduce match {
      case Some(r) => reduceEntries(df, r, keepKb = true)
      case None => df.select(col("kb"), col("key_json"), col("file_url"), col("seq"), col("value_json"))
    }

    val ordCols: Seq[Column] =
      if (views(view).reduce.isDefined) Seq(col("kb"))
      else Seq(col("kb"), col("file_url"), col("seq"))
    val ord = if (opts.reverse) ordCols.map(_.desc) else ordCols

    val limited = opts.limit match {
      case Some(n) if views(view).reduce.isEmpty =>
        // Limit counts keys, then multi-values flatten (view.js:73-82).
        val keyOrd = if (opts.reverse) col("kb").desc else col("kb").asc
        val topKeys = reduced.select(col("kb")).distinct().orderBy(keyOrd).limit(n)
        reduced.join(broadcast(topKeys), "kb")
      case Some(n) => reduced.orderBy(ord: _*).limit(n)
      case None => reduced
    }
    limited.orderBy(ord: _*).select(col("key_json"), col("value_json"))
  }

  /** Driver-side `list` returning parsed entries. */
  def listEntries(view: String, opts: ListOpts = ListOpts()): Seq[Entry] =
    list(view, opts).collect().toSeq.map { r =>
      Entry(Json.parse(r.getAs[String]("key_json")), Json.parse(r.getAs[String]("value_json")))
    }

  // --- internals -----------------------------------------------------

  private def viewDir(view: String): String = s"$stateRoot/$view/entries"

  /** Run a view's map over matched files, producing entry rows. */
  private[graft] def mapEntries(view: ViewDef, files: DataFrame): DataFrame = {
    val emitted = view.map match {
      case MapDF(f) =>
        val out = f(files)
        // seq = deterministic per-file emit ordinal for declarative maps
        // (emit order is undefined there; key order is the stable choice).
        out.withColumn("seq",
          row_number().over(Window.partitionBy(col("url")).orderBy(col("kb"), col("value_json"))))
      case MapFn(f) =>
        import spark.implicits._
        val fn = f
        files.select(col("origin"), col("url"), col("pathname"), col("value"))
          .as[(String, String, String, String)]
          .flatMap { case (origin, url, pathname, value) =>
            fn(value, FileMeta(origin, url, pathname)).zipWithIndex.map {
              case ((k, v), i) =>
                val key = KeyCodec.asKey(k)
                (origin, url, pathname, KeyCodec.encode(key), KeyCodec.json(key),
                  Json.render(v), i + 1)
            }
          }
          .toDF("origin", "url", "pathname", "kb", "key_json", "value_json", "seq")
    }
    projectEntries(emitted)
  }

  private def projectEntries(emitted: DataFrame): DataFrame =
    emitted.select(
      col("kb"), col("key_json"),
      col("url").as("file_url"), col("pathname"),
      col("seq"), col("value_json"),
      sha2(col("origin"), 256).substr(1, 16).as("ob"))

  /** A4 `watch` mode: the view's map pipeline applied to a STREAMING
    * files DataFrame (Structured Streaming file source with the archive
    * schema `origin,url,pathname,value,fversion`). The caller wires it to
    * an append sink on the view dir (`indexer.js:67` re-indexes on file
    * events; here arriving files stream straight through the same
    * declarative map). `seq` is constant in streaming — appends are
    * retraction-free and per-file multi-values order by key bytes.
    */
  def streamEntries(view: String, files: DataFrame): DataFrame = {
    require(views.contains(view), s"$view is not defined")
    val v = views(view)
    val matched = files.filter(col("pathname").rlike(v.pathRegex))
    v.map match {
      case MapDF(f) => projectEntries(f(matched).withColumn("seq", lit(1)))
      case MapFn(_) => mapEntries(v, matched) // typed flatMap is streaming-safe
    }
  }

  /** `damr.index(archive, {watch: true})` — start continuous maintenance
    * of every defined view over a watched directory: one streaming query
    * per view, each appending mapped entries to the view's state dir.
    * Returns the running queries (caller stops them); checkpoints live
    * under `{stateRoot}/_checkpoints/{view}`.
    */
  def watch(archive: DirArchive): Seq[org.apache.spark.sql.streaming.StreamingQuery] = {
    val root = archive.rootPath.stripSuffix("/")
    val files = spark.readStream
      .format("text").option("wholetext", "true")
      .load(root)
      .select(
        lit(archive.url).as("origin"),
        concat(lit(archive.url),
          expr(s"substring(_metadata.file_path, ${root.length + "file:".length + 1})")).as("url"),
        expr(s"substring(_metadata.file_path, ${root.length + "file:".length + 1})").as("pathname"),
        col("value"),
        unix_millis(col("_metadata.file_modification_time")).as("fversion"))
    views.keys.toSeq.map { name =>
      // foreachBatch + plain batch append, NOT the parquet streaming sink:
      // the sink's _spark_metadata log would own the directory listing and
      // hide every batch write (incremental re-index, compaction) from
      // readers. State dirs are shared batch/streaming, so they must stay
      // plain parquet; the stream checkpoint still dedupes micro-batches.
      streamEntries(name, files).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$stateRoot/_checkpoints/$name")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").partitionBy("ob").parquet(viewDir(name))
          spark.catalog.refreshByPath(viewDir(name))
        }
        .start()
    }
  }

  private def entriesForOrigin(view: String, origin: String): DataFrame =
    entries(view).filter(col("ob") === escape(origin))

  /** Dynamic partition overwrite of exactly the origin partitions present
    * in `rows` — the incremental-maintenance primitive.
    *
    * When `rows` derives from the view's own current state (incremental
    * merge), Spark refuses to overwrite a path it is reading; the carried
    * rows are materialized first (localCheckpoint — executor-local, sized
    * to ONE origin's entries, the incremental unit, never the whole view).
    */
  private def writeOriginPartition(
      view: String, origin: String, rows: DataFrame,
      readsState: Boolean = false): Unit = {
    val out = if (readsState) rows.localCheckpoint(true) else rows
    out.write
      .partitionBy("ob")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(viewDir(view))
    // the session-shared FileStatusCache would otherwise serve the old
    // file listing to the next read of this path
    spark.catalog.refreshByPath(viewDir(view))
  }

  private def reduceEntries(df: DataFrame, r: Reduce, keepKb: Boolean = false): DataFrame = {
    val grouped = df.groupBy(col("kb"), col("key_json"))
    val agg = r match {
      case Reduce.Count => grouped.agg(count(lit(1)).as("cnt"))
        .withColumn("value_json", col("cnt").cast("string"))
      case Reduce.Sum => grouped.agg(sum(col("value_json").cast("double")).as("s"))
        .withColumn("value_json", udfRenderNum(col("s")))
      case Reduce.Min => grouped.agg(min(col("value_json").cast("double")).as("s"))
        .withColumn("value_json", udfRenderNum(col("s")))
      case Reduce.Max => grouped.agg(max(col("value_json").cast("double")).as("s"))
        .withColumn("value_json", udfRenderNum(col("s")))
      case Reduce.Assoc(f) =>
        grouped.agg(udaf(new JsonMergeAggregator(f)).apply(col("value_json")).as("value_json"))
      case Reduce.Fold(f) =>
        val foldUdf = udf(
          new org.apache.spark.sql.api.java.UDF2[scala.collection.Seq[Row], String, String] {
            override def call(vals: scala.collection.Seq[Row], keyJson: String): String = {
              val key = Json.parse(keyJson)
              val sorted = vals.sortBy(r => (r.getAs[String]("file_url"), r.getAs[Int]("seq")))
              var acc: Option[Any] = None
              sorted.foreach { row =>
                acc = Some(f(acc, Json.parse(row.getAs[String]("value_json")), key))
              }
              Json.render(acc.orNull)
            }
          }, org.apache.spark.sql.types.StringType)
        grouped.agg(collect_list(struct(col("file_url"), col("seq"), col("value_json"))).as("vs"))
          .withColumn("value_json", foldUdf(col("vs"), col("key_json")))
    }
    if (keepKb) agg.select(col("kb"), col("key_json"), col("value_json"))
    else agg.select(col("key_json"), col("value_json"))
  }

  private val udfRenderNum = udf { (d: Double) => Json.renderNum(d) }

  private def emptyEntries(): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Graft.entrySchemaWithPartition)

  private def escape(origin: String): String = {
    // must match the `ob` column produced in mapEntries
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(origin.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.substring(0, 16)
  }

  private def deleteDir(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      spark.catalog.refreshByPath(path)
    }
  }

  // Tiny driver-side catalog (the reference keeps this metadata in
  // LevelDB sublevels; it is O(#origins), not data-plane).
  private def catalogPath = Paths.get(s"$stateRoot/_catalog.json")

  private def saveCatalog(): Unit = {
    Files.createDirectories(catalogPath.getParent)
    def obj(m: collection.Map[String, Long]): String =
      m.map { case (k, v) => Json.renderString(k) + ":" + v }.mkString("{", ",", "}")
    val body = "{\"origins\":" + obj(indexed) + ",\"views\":" + obj(viewVersions) + "}"
    Files.write(catalogPath, body.getBytes(StandardCharsets.UTF_8))
  }

  private def loadCatalog(): Unit = {
    if (Files.exists(catalogPath)) {
      val txt = new String(Files.readAllBytes(catalogPath), StandardCharsets.UTF_8)
      val root = Json.parse(txt).asInstanceOf[Map[String, Any]]
      def into(m: Any, dst: mutable.LinkedHashMap[String, Long]): Unit =
        m.asInstanceOf[Map[String, Any]].foreach {
          case (k, v: Double) => dst(k) = v.toLong
          case _ =>
        }
      into(root.getOrElse("origins", Map.empty), indexed)
      into(root.getOrElse("views", Map.empty), viewVersions)
    }
  }
}

object Graft {
  import org.apache.spark.sql.types._

  /** Shared pool for concurrent view-materialization job submission —
    * bounded so a many-view engine doesn't flood the scheduler.
    */
  private[core] lazy val indexPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        8,
        r => { val t = new Thread(r, "graft-index"); t.setDaemon(true); t }))

  val entrySchema: StructType = StructType(Seq(
    StructField("kb", BinaryType),
    StructField("key_json", StringType),
    StructField("file_url", StringType),
    StructField("pathname", StringType),
    StructField("seq", IntegerType),
    StructField("value_json", StringType)))

  val entrySchemaWithPartition: StructType =
    entrySchema.add(StructField("ob", StringType))
}
